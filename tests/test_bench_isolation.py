"""bench.py metric failure isolation (r04 weak #3): the r04 driver
capture lost every pairwise metric to one assert in a SECONDARY bench.
``bench._emit`` must convert any failure into an {"metric", "error"}
JSON line and keep going, so the primary metric always gets a chance to
print.  Pure-Python test (no jax, no TPU)."""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench


def test_emit_isolates_failures(capsys):
    def boom():
        raise AssertionError("cell cap exhausted: max occupancy 33 > cap 32")

    ok = bench._emit("broken secondary", boom, "steps/s", 10.0)
    assert ok is False
    ok2 = bench._emit("surviving metric", lambda: 42.0, "steps/s", 10.0)
    assert ok2 is True
    lines = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(line) for line in lines]
    assert recs[0]["metric"] == "broken secondary"
    assert "cell cap exhausted" in recs[0]["error"]
    assert "value" not in recs[0]
    assert recs[1] == {
        "metric": "surviving metric",
        "value": 42.0,
        "unit": "steps/s",
        "vs_baseline": 4.2,
    }


def test_emit_isolates_system_exit(capsys):
    """Even SystemExit/KeyboardInterrupt-class failures in a metric fn are
    isolated (BaseException): the driver's record must never end at a
    secondary metric again."""

    def quit_():
        raise SystemExit(3)

    assert bench._emit("exiting metric", quit_, "hills/s", 100.0) is False
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert rec["metric"] == "exiting metric" and "error" in rec
