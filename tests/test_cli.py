"""CLI smoke + log-format test."""

import json
import subprocess
import sys
from pathlib import Path

from fixture_gen import make_fixture

REPO = Path(__file__).resolve().parent.parent


def test_eval_cli(tmp_path):
    gt, preds = make_fixture(seed=1, num_videos=3, frames_per_video=12)
    gt_path = tmp_path / "gt.json"
    pred_path = tmp_path / "preds.json"
    log_path = tmp_path / "out" / "eval.log"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))

    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "eval_on_tao_amodal.py"),
         "--track_result", str(pred_path),
         "--output_log", str(log_path),
         "--annotation", str(gt_path)],
        capture_output=True, text=True, cwd=str(REPO), timeout=300)
    assert proc.returncode == 0, proc.stderr

    log = log_path.read_text()
    # Machine-greppable lines present (reference CLI :114-115, :150-151).
    copypaste = [ln for ln in log.splitlines() if "copypaste:" in ln]
    assert len(copypaste) == 4
    assert copypaste[0].endswith("APr,APc,APf")
    assert "TAO 3DmAP50,TAO 3DmAP50-HP,TAO 3DmAP,TAO 3DmAP-HP" in copypaste[2]
    # Summary numbers parse as floats.
    vals = copypaste[3].split("copypaste: ")[1].split(",")
    assert len(vals) == 4
    [float(v) for v in vals]


def test_eval_cli_device_path_matches_host(tmp_path):
    """--device_eval must produce an IDENTICAL log to the host path
    (VERDICT: the same CLI runs the device evaluators)."""
    gt, preds = make_fixture(seed=5, num_videos=3, frames_per_video=10)
    gt_path = tmp_path / "gt.json"
    pred_path = tmp_path / "preds.json"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))

    logs = {}
    for mode, extra in (("host", []), ("device", ["--device_eval"])):
        log_path = tmp_path / mode / "eval.log"
        proc = subprocess.run(
            [sys.executable,
             str(REPO / "tools" / "eval_on_tao_amodal.py"),
             "--track_result", str(pred_path),
             "--output_log", str(log_path),
             "--annotation", str(gt_path)] + extra,
            capture_output=True, text=True, cwd=str(REPO),
            timeout=1800)
        assert proc.returncode == 0, proc.stderr
        logs[mode] = log_path.read_text()

    assert logs["device"] == logs["host"]
    assert logs["host"].count("copypaste:") == 4
