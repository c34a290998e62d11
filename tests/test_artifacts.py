"""Artifact tracking (DVC-analog) workflow."""
import json
import os

from artgraph_tpu import artifacts


def test_track_push_pull_roundtrip(tmp_path):
    data = tmp_path / "model.pt"
    data.write_bytes(b"weights" * 1000)
    remote = str(tmp_path / "remote")

    pointer = artifacts.track(str(data))
    meta = json.loads(open(pointer).read())
    assert meta["size"] == 7000 and len(meta["md5"]) == 32

    blob = artifacts.push(str(data), remote)
    assert os.path.exists(blob)

    data.unlink()
    artifacts.pull(str(data), remote)
    assert data.read_bytes() == b"weights" * 1000

    st = artifacts.status(str(data), remote)
    assert st == {"tracked": True, "local": True, "in_remote": True,
                  "dirty": False}


def test_status_detects_dirty(tmp_path):
    data = tmp_path / "f.bin"
    data.write_bytes(b"aaa")
    artifacts.track(str(data))
    data.write_bytes(b"bbb")
    assert artifacts.status(str(data))["dirty"] is True
