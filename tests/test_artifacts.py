"""Integrity of the COMMITTED durable checkpoint artifacts.

`artifacts/` holds the ladder's EMA checkpoints as split-npz parts with a
sha256 manifest (tools/export_ckpt.py) — the mechanism that closed the
"VM recycle wipes the ladder" failure mode (ROADMAP.md round 5). These
tests make the repo itself prove the artifacts it carries are restorable:
every part file present, byte-exact (sha256), and the manifest's embedded
run_config sufficient to rebuild the model (grid size + image size
present). A corrupted or truncated artifact fails CI instead of failing a
future warm-start.

Reference anchor: the reference's checkpoints are unchecked pickled blobs
(image_model/train_JPDVT.py:408-418) that did not survive into its public
repo (.MISSING_LARGE_BLOBS) — this is the upgrade.
"""

import glob
import hashlib
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")

MANIFESTS = sorted(glob.glob(os.path.join(ART, "*.manifest.json")))


@pytest.mark.skipif(not MANIFESTS, reason="no committed artifacts")
@pytest.mark.parametrize("manifest_path", MANIFESTS,
                         ids=[os.path.basename(p) for p in MANIFESTS])
def test_artifact_parts_are_intact(manifest_path):
    with open(manifest_path) as f:
        m = json.load(f)
    assert m["format"] == 1
    assert m["contents"] == "ema_params"
    assert m["param_count"] > 0

    total = 0
    whole = hashlib.sha256()
    for part in m["parts"]:
        path = os.path.join(ART, part["file"])
        assert os.path.exists(path), f"missing part {part['file']}"
        with open(path, "rb") as pf:
            blob = pf.read()
        assert len(blob) == part["bytes"], f"truncated part {part['file']}"
        assert hashlib.sha256(blob).hexdigest() == part["sha256"], \
            f"corrupt part {part['file']}"
        whole.update(blob)
        total += len(blob)
    assert total == m["npz_bytes"]
    assert whole.hexdigest() == m["npz_sha256"]

    # the restore smoke rebuilds the model from this config — it must pin
    # the geometry (export warns if run_config.json was missing)
    cfg = m["run_config"]
    assert cfg, f"{m['name']}: manifest carries no run_config"
    assert cfg["task"]["grid_size"] >= 2
    assert cfg["model"]["image_size"] % cfg["task"]["grid_size"] == 0
