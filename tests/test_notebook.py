"""Execute notebooks/proposed_model_multitask.ipynb end-to-end with nbclient
(the reference notebook is a runnable replica of the best-model script, ref
notebooks/proposed_model_multitask.ipynb + README.md:95 — ours must be too;
it is the only shipped artifact outside the CLI/test surface).

The notebook runs in a FRESH Jupyter kernel: paths are relocated onto the
synthetic fixture via the ARTGRAPH_* env overrides (config.py:14-22), the
platform is pinned to CPU via ARTGRAPH_PLATFORM (cli/_common.py), and a
papermill-style parameter cell is injected after the ARGS cell to shrink the
run (resnet trunk, batch 8, 2 epochs). Asserts the per-epoch train loss
decreases and the final cell reports test accuracies."""
import os
import re

import numpy as np
import pytest

NB_PATH = os.path.join(os.path.dirname(__file__), os.pardir, "notebooks",
                       "proposed_model_multitask.ipynb")


@pytest.fixture()
def notebook_env(synthetic_dataset, tmp_path, monkeypatch):
    from artgraph_tpu.data.embeddings import save_embedding

    ds = synthetic_dataset["dataset_dir"]
    rng = np.random.default_rng(5)
    names = {"train": ("gnn_style_embs_graph.pt", "gnn_genre_embs_graph.pt"),
             "validation": ("gnn_style_valid_embs_graph.pt",
                            "gnn_genre_valid_embs_graph.pt"),
             "test": ("gnn_style_test_embs_graph.pt",
                      "gnn_genre_test_embs_graph.pt")}
    for split, count in synthetic_dataset["counts"].items():
        emb_dir = os.path.join(ds, split, "embeddings")
        os.makedirs(emb_dir, exist_ok=True)
        for name in names[split]:
            save_embedding(os.path.join(emb_dir, name),
                           rng.normal(size=(count, 128)).astype(np.float32))

    ck = tmp_path / "checkpoints"
    ck.mkdir()
    monkeypatch.setenv("ARTGRAPH_DATASET_DIR", ds)
    monkeypatch.setenv("ARTGRAPH_IMAGE_DIR", synthetic_dataset["image_dir"])
    monkeypatch.setenv("ARTGRAPH_CHECKPOINTS_DIR", str(ck))
    monkeypatch.setenv("ARTGRAPH_PLATFORM", "cpu")
    return {"ck": str(ck)}


def test_notebook_executes_and_learns(notebook_env):
    import nbformat
    from nbclient import NotebookClient

    nb = nbformat.read(NB_PATH, as_version=4)
    # inject the parameter override right after the ARGS cell
    args_idx = next(i for i, c in enumerate(nb.cells)
                    if c.cell_type == "code" and "ARGS = dict(" in c.source)
    nb.cells.insert(args_idx + 1, nbformat.v4.new_code_cell(
        "ARGS.update(batch=8, epochs=2, architecture='resnet', "
        "emb_type='artwork')"))

    client = NotebookClient(nb, timeout=1200, kernel_name="python3")
    client.execute()

    text = "\n".join(
        out.get("text", "")
        for cell in nb.cells if cell.cell_type == "code"
        for out in cell.get("outputs", []))
    losses = [float(m) for m in re.findall(r"Train loss: ([0-9.eE+-]+)", text)]
    assert len(losses) == 2, f"expected 2 epochs of output, got: {text[-2000:]}"
    assert losses[1] < losses[0], f"train loss did not decrease: {losses}"
    assert re.search(r"Test style accuracy: [0-9.]+; test genre accuracy:",
                     text), text[-2000:]
    assert os.path.exists(os.path.join(
        notebook_env["ck"], "new-multimodal_multi-task_checkpoint.pt"))
