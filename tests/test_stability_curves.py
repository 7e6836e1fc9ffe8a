"""Long-horizon training-stability regression pins (VERDICT r2 #1).

Round 3 ran two 30k-step on-chip experiments whose measured curves are
committed as run_r3*/curves.json (regenerate with
`python tools/curve_report.py <metrics.jsonl> <train.log> --json <out>`):

  * run_r3 — finite 4,096-sample synthetic set, held-out seed-1234 eval,
    reference schedule compressed 10x (LR boundaries 5k/10k/15k/20k).
  * run_r3_online — identical except the training data is an infinite
    on-device stream (data/online.py): no finite set to memorize, so the
    held-out curve isolates optimizer/loss stability from generalization.

These tests pin the curves' qualitative shape with tolerance bands so a
future dynamics regression (like round 2's unexplained 0.0159 -> 0.0306
eval-CD doubling, PARITY.md) cannot land silently behind a re-run: anyone
replacing the artifacts with a new run's curves must still satisfy the
stability criteria.
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(rel):
    with open(os.path.join(ROOT, rel)) as f:
        return json.load(f)


def _window_mean(rows, sl):
    vals = [r["cd"] for r in rows[sl]]
    return sum(vals) / len(vals)


def test_finite_run_is_overfit_not_instability():
    """The finite-set run's held-out CD is flat through the high-LR phase
    and drifts only boundedly afterwards, while the training CD keeps
    falling — the generalization-gap signature, not optimizer divergence."""
    c = _load("run_r3/curves.json")
    evals = c["eval"]
    assert len(evals) >= 10, "expected the full 2500-step eval cadence"
    # high-LR phase (steps <= 10000): flat band around the 0.026 plateau
    early = [r["cd"] for r in evals if r["step"] <= 10000]
    assert early and max(early) <= 0.0270
    # post-boundary drift stays bounded (round 2's doubling would fail this)
    assert evals[-1]["cd"] <= 0.0320
    assert evals[-1]["cd"] <= 1.25 * min(r["cd"] for r in evals)
    # training objective genuinely improves across the run
    tr = c["train_cd"]
    assert len(tr) >= 20
    assert _window_mean(tr, slice(-5, None)) <= 0.80 * _window_mean(tr, slice(5))


def test_round4_100k_run_full_convergence_curve():
    """Round 4's 100k-step online-stream run (run_r4/): the long-horizon
    capability pin. Held-out CD must decline from the early-training band
    into a stable plateau that holds to the end — the curve the eval-CLI
    cross-check (run_r4/results_synth/) reproduced exactly."""
    c = _load("run_r4/curves.json")
    evals = c["eval"]
    assert len(evals) >= 20, "expected the full 5k-step eval cadence to 100k"
    assert evals[-1]["step"] >= 100_000
    cds = [r["cd"] for r in evals]
    assert min(cds) <= 0.0234, "plateau quality regressed"
    # plateau: every eval from 55k on sits in a tight band around the best
    late = [r["cd"] for r in evals if r["step"] >= 55_000]
    assert late and max(late) <= 1.03 * min(cds), "late-training instability"
    # bounded excursion: nothing ever exceeds the first eval by >2%
    # (the measured worst is a +1.2% bump at 35k during the high-LR phase)
    assert max(cds) <= 1.02 * cds[0]
    # the best checkpoint the serving cross-check used
    assert abs(min(cds) - 0.023228) < 5e-5


def test_round4_continuation_deterministic_resume_and_new_best():
    """The round-4 continuation (run_r4/drive3.sh) resumed from the
    committed step-95000 best checkpoint after a box restart wiped the
    workdir, replayed 95k->100k (synthetic_online batches are keyed on
    state.step), and trained on into the final-LR phase. Two pins:

      1. DETERMINISM: the replayed segment reproduces the original run —
         the 100k held-out eval and every overlapping 500-step train-CD
         window are identical in both committed artifacts.
      2. CONTINUED IMPROVEMENT: the extension found a new best
         (0.023168 @ 105k < 0.023228 @ 95k) while staying inside the
         plateau band — more final-phase steps still help, mirroring the
         reference's 230k-step regime.
    """
    base = _load("run_r4/curves.json")
    merged = _load("run_r4/curves_150k.json")
    b_eval = {r["step"]: (r["cd"], r["emd"]) for r in base["eval"]}
    m_eval = {r["step"]: (r["cd"], r["emd"]) for r in merged["eval"]}
    # determinism: the replayed 100k eval matches the original exactly
    assert m_eval[100_000] == b_eval[100_000]
    # overlapping train-CD windows identical (the replay covers >= 5 of them)
    b_tr = {r["step"]: r["cd"] for r in base["train_cd"]}
    m_tr = {r["step"]: r["cd"] for r in merged["train_cd"]}
    common = [s for s in m_tr if s in b_tr and 95_000 < s <= 100_000]
    assert len(common) >= 5
    assert all(m_tr[s] == b_tr[s] for s in common)
    # the extension's evals extend the curve and stay in the plateau band
    assert max(m_eval) >= 105_000
    cds = [cd for cd, _ in m_eval.values()]
    best = min(cds)
    assert best <= 0.023228 - 5e-5, "extension should find a new best"
    late = [cd for s, (cd, _) in m_eval.items() if s >= 55_000]
    assert max(late) <= 1.03 * best, "late-training instability"


def test_online_stream_run_converges_to_plateau():
    """With no finite set to memorize, the held-out curve must be
    monotone-to-plateau: net improvement, best value beating the finite
    run's plateau, and no terminal divergence."""
    c = _load("run_r3_online/curves.json")
    evals = c["eval"]
    assert len(evals) >= 5
    cds = [r["cd"] for r in evals]
    assert min(cds) <= 0.0260, "should improve past the finite run's plateau"
    assert cds[-1] <= 1.08 * min(cds), "terminal divergence"
    assert cds[-1] <= cds[0], "no net improvement over the run"
    # train-batch CD on an infinite stream IS a generalization metric
    # (every batch is unseen), so unlike the finite run it cannot fall by
    # memorization — pin net improvement, not a deep drop
    tr = c["train_cd"]
    assert len(tr) >= 20
    assert _window_mean(tr, slice(-5, None)) <= 0.95 * _window_mean(tr, slice(5))
