"""EarlyStopping state machine (ref: src/models/models.py:9-39)."""
from artgraph_tpu.train import EarlyStopping


def _make(patience=2, **kw):
    saves = []
    es = EarlyStopping(patience=patience, min_delta=0.001,
                       checkpoint_path="x.pt",
                       save_fn=lambda state, path: saves.append(state), **kw)
    return es, saves


def test_saves_on_first_and_improvements():
    es, saves = _make()
    es(1.0, "a")   # first -> save
    es(0.5, "b")   # improvement -> save
    es(0.6, "c")   # worse -> no save
    assert saves == ["a", "b"]
    assert es.wait == 1 and not es.stop


def test_stop_after_patience():
    es, _ = _make(patience=2)
    es(1.0, "a")
    es(1.1, "b")
    es(1.2, "c")
    assert es.stop


def test_wait_resets_on_improvement():
    # fixed vs reference quirk (models.py:35 resets the wrong attribute)
    es, _ = _make(patience=3)
    es(1.0, "a")
    es(1.1, "b")   # wait=1
    es(0.5, "c")   # improvement -> wait resets
    assert es.wait == 0


def test_legacy_counter_bug_mode():
    es, _ = _make(patience=3, legacy_counter_bug=True)
    es(1.0, "a")
    es(1.1, "b")   # wait=1
    es(0.5, "c")   # improvement, but legacy mode never resets wait
    assert es.wait == 1


def test_min_delta_threshold():
    es, saves = _make(patience=5)
    es(1.0, "a")
    es(0.9995, "b")  # improvement smaller than min_delta -> not an improvement
    assert saves == ["a"] and es.wait == 1
