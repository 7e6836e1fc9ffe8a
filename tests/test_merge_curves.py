"""tools/merge_curves.py: step-keyed merge semantics for resumed runs.

The continuation drive (run_r4/drive3.sh) resumes from the committed best
checkpoint, replaying an already-logged window; the merge must dedup by
step with the continuation winning, keep disjoint rows from both sides,
and stay section-complete. Pinned on synthetic artifacts so the logic is
covered without the committed run files.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from merge_curves import _merge, main  # noqa: E402


def test_merge_dedups_and_sorts():
    base = [{"step": 500, "cd": 1.0}, {"step": 1000, "cd": 0.9},
            {"step": 1000, "cd": 0.8}]  # double-logged kill+resume window
    ext = [{"step": 1000, "cd": 0.8}, {"step": 1500, "cd": 0.7}]
    rows, overlaps = _merge(base, ext)
    assert [r["step"] for r in rows] == [500, 1000, 1500]
    assert rows[1]["cd"] == 0.8  # continuation wins
    assert overlaps == []  # identical replay row is not an overlap delta


def test_merge_reports_replay_delta():
    base = [{"step": 1000, "cd": 0.9}]
    ext = [{"step": 1000, "cd": 0.91}]
    rows, overlaps = _merge(base, ext)
    assert rows == [{"step": 1000, "cd": 0.91}]
    assert len(overlaps) == 1 and overlaps[0][0] == 1000


def test_main_end_to_end(tmp_path, capsys):
    b = tmp_path / "base.json"
    e = tmp_path / "ext.json"
    out = tmp_path / "merged.json"
    b.write_text(json.dumps({
        "train_cd": [{"step": 499, "cd": 0.06}],
        "eval": [{"step": 5000, "cd": 0.025, "emd": 0.26},
                 {"step": 10000, "cd": 0.024, "emd": 0.25}],
    }))
    e.write_text(json.dumps({
        "train_cd": [{"step": 10499, "cd": 0.05}],
        "eval": [{"step": 10000, "cd": 0.024, "emd": 0.25},
                 {"step": 15000, "cd": 0.023, "emd": 0.25}],
    }))
    main([str(b), str(e), "--out", str(out)])
    merged = json.loads(out.read_text())
    assert [r["step"] for r in merged["eval"]] == [5000, 10000, 15000]
    assert [r["step"] for r in merged["train_cd"]] == [499, 10499]
    assert "best cd 0.023000 @ 15000" in capsys.readouterr().out
