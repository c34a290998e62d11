"""Metrics must match sklearn (the de-facto oracle for the results CSVs)."""
import numpy as np
import pandas as pd
import sklearn.metrics as skm

from artgraph_tpu.metrics import classification as M
from artgraph_tpu.metrics.results import write_results


def _fake(n=200, c=6, seed=0):
    rng = np.random.default_rng(seed)
    y_true = rng.integers(0, c, size=n)
    scores = rng.normal(size=(n, c))
    return y_true, scores, np.argmax(scores, -1)


def test_accuracy_and_topk():
    y_true, scores, y_pred = _fake()
    assert M.accuracy(y_true, y_pred) == skm.accuracy_score(y_true, y_pred)
    assert abs(M.top_k_accuracy(y_true, scores, 2)
               - skm.top_k_accuracy_score(y_true, scores, k=2)) < 1e-12


def test_confusion_and_balanced_accuracy():
    y_true, _, y_pred = _fake(seed=1)
    np.testing.assert_array_equal(
        M.confusion_matrix(y_true, y_pred, 6),
        skm.confusion_matrix(y_true, y_pred, labels=range(6)))
    assert abs(M.balanced_accuracy(y_true, y_pred, 6)
               - skm.balanced_accuracy_score(y_true, y_pred)) < 1e-12


def test_precision_recall_f1_macro_weighted():
    y_true, _, y_pred = _fake(seed=2)
    prf = M.precision_recall_f1(y_true, y_pred, 6)
    for avg in ("macro", "weighted"):
        p, r, f, _ = skm.precision_recall_fscore_support(
            y_true, y_pred, average=avg, zero_division=0)
        assert abs(prf[f"{avg}-precision"] - p) < 1e-12
        assert abs(prf[f"{avg}-recall"] - r) < 1e-12
        assert abs(prf[f"{avg}-f1"] - f) < 1e-12


def test_write_results_schema(tmp_path):
    y_true, scores, _ = _fake(seed=3)
    summary = M.summarize(y_true, scores, 6)
    write_results(str(tmp_path), summary, suffix="_genre")

    results = pd.read_csv(tmp_path / "results_genre.csv", index_col=0)
    assert list(results.index) == [
        "accuracy", "top-2-accuracy", "macro-f1",
        "macro-precision", "macro-recall"]
    assert results.columns.tolist() == ["0"]

    pr = pd.read_csv(tmp_path / "precisions_recalls_genre.csv", index_col=0)
    assert pr.columns.tolist() == ["precisions", "recalls", "f1"]
    assert len(pr) == 6

    cm = pd.read_csv(tmp_path / "confusion_matrix_genre.csv", index_col=0)
    assert cm.index.name == "index_name"
    assert cm.values.sum() == 200

    tp = pd.read_csv(tmp_path / "true_preds_genre.csv", index_col=0)
    assert tp.columns.tolist() == ["true", "prediction"]
