"""Unit tests for tools/scaling_merge.py — the campaign-pool merge that
produces the north-rule scaling headline.  Pure Python (no Spark): the
merge is part of the evidence chain, so its selection rules need the
same test coverage as an operator.
"""

import copy
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from scaling_merge import _leg_gate_reason, merge  # noqa: E402


def _run(executors, sec, *, steal=0.0, ctl=(2.0, 2.0), execs=None):
    return {
        "executors": executors,
        "cores": executors,  # 1-core executors, cores == executors
        "sec": sec,
        "triples": 1000,
        "execs_start": execs if execs is not None else executors,
        "execs_end": execs if execs is not None else executors,
        "control_before": ctl[0],
        "control_after": ctl[1],
        "steal_frac": steal,
    }


def _campaign(tmp_path, name, pairs_spec):
    """pairs_spec: list of (runN, run4N, recorded_pair_eff)."""
    import json

    d = {
        "n_convs": 400,
        "triples": 1000,
        "corpus_spec": "spec-A",
        "N_1x4": {"sec": min(a["sec"] for a, _, _ in pairs_spec),
                  "runs": [a for a, _, _ in pairs_spec]},
        "4N_4x4": {"sec": min(b["sec"] for _, b, _ in pairs_spec),
                   "runs": [b for _, b, _ in pairs_spec]},
        "pair_efficiencies": [e for _, _, e in pairs_spec],
        "scaling_efficiency_estimator": "median of pairs",
        "discarded_runs": [],
    }
    p = tmp_path / name
    p.write_text(json.dumps(d))
    return str(p)


class TestLegGate:
    def test_quiet_run_passes(self):
        assert _leg_gate_reason(_run(1, 100.0)) is None

    def test_steal_over_threshold_fails(self):
        r = _leg_gate_reason(_run(1, 100.0, steal=0.0127))
        assert r is not None and "steal" in r

    def test_steal_at_threshold_passes(self):
        assert _leg_gate_reason(_run(1, 100.0, steal=0.01)) is None

    def test_control_drift_fails(self):
        r = _leg_gate_reason(_run(1, 100.0, ctl=(3.2, 1.9)))
        assert r is not None and "control" in r

    def test_executor_loss_fails(self):
        run = _run(4, 100.0)
        run["execs_end"] = 3
        r = _leg_gate_reason(run)
        assert r is not None and "executors" in r


class TestMerge:
    def test_pools_pairs_and_medians(self, tmp_path):
        p1 = _campaign(tmp_path, "a.json",
                       [(_run(1, 400.0), _run(4, 110.0), 0.909),
                        (_run(1, 400.0), _run(4, 125.0), 0.8)])
        p2 = _campaign(tmp_path, "b.json",
                       [(_run(1, 420.0), _run(4, 150.0), 0.7)])
        r = merge([p1, p2])
        assert r["pair_efficiencies"] == [0.909, 0.8, 0.7]
        assert r["scaling_efficiency"] == 0.8  # median, not max
        assert r["best_pair_efficiency"] == 0.909
        assert len(r["N_1x4"]["runs"]) == 3
        assert len(r["4N_4x4"]["runs"]) == 3

    def test_regate_drops_stolen_pair_with_per_leg_reasons(self, tmp_path):
        # pair 1 quiet; pair 2's 4N leg ran under steal -> whole pair out,
        # each discarded leg carrying its OWN reason
        p = _campaign(tmp_path, "a.json",
                      [(_run(1, 400.0), _run(4, 110.0), 0.909),
                       (_run(1, 400.0), _run(4, 160.0, steal=0.028), 0.625)])
        r = merge([p], regate=True)
        assert r["pair_efficiencies"] == [0.909]
        assert r["scaling_efficiency"] == 0.909
        reasons = [d["discard_reason"] for d in r["discarded_runs"]]
        assert len(reasons) == 2
        assert any("steal_frac 0.028" in x for x in reasons)
        assert any("pair partner failed" in x for x in reasons)

    def test_regate_cross_leg_control_gate(self, tmp_path):
        # pair 2's legs are individually stable but saw different box
        # speeds (controls 2.0 vs 3.2) -> dropped by the cross-leg gate
        p = _campaign(tmp_path, "a.json",
                      [(_run(1, 400.0), _run(4, 110.0), 0.909),
                       (_run(1, 400.0, ctl=(2.0, 2.0)),
                        _run(4, 160.0, ctl=(3.2, 3.2)), 0.625)])
        r = merge([p], regate=True)
        assert r["pair_efficiencies"] == [0.909]
        assert len(r["discarded_runs"]) == 2
        assert all("different box speeds" in d["discard_reason"]
                   for d in r["discarded_runs"])

    def test_regate_discards_runs_missing_probe_fields(self, tmp_path):
        # a pre-probe run cannot pass a gate it never recorded — it
        # must be discarded, not defaulted to passing values
        noprobe = _run(4, 110.0)
        del noprobe["steal_frac"]
        p = _campaign(tmp_path, "a.json",
                      [(_run(1, 400.0), _run(4, 110.0), 0.909),
                       (_run(1, 400.0), noprobe, 0.909)])
        r = merge([p], regate=True)
        assert r["pair_efficiencies"] == [0.909]
        assert any("probe fields not recorded: steal_frac"
                   in d["discard_reason"] for d in r["discarded_runs"])

    def test_refuses_non_pairwise_run_lists(self, tmp_path):
        import json

        p = _campaign(tmp_path, "a.json",
                      [(_run(1, 400.0), _run(4, 110.0), 0.909)])
        d = json.loads(open(p).read())
        d["N_1x4"]["runs"].append(_run(1, 410.0))  # unpaired trailing leg
        open(p, "w").write(json.dumps(d))
        with pytest.raises(SystemExit, match="not pairwise"):
            merge([p], regate=True)

    def test_regate_all_pairs_dropped_is_loud(self, tmp_path):
        # a pool with zero surviving pairs must fail, not emit an
        # empty-median headline
        p = _campaign(tmp_path, "a.json",
                      [(_run(1, 400.0), _run(4, 160.0, steal=0.028), 0.625)])
        with pytest.raises(SystemExit, match="no pairs"):
            merge([p], regate=True)

    def test_without_regate_keeps_all_recorded_pairs(self, tmp_path):
        p = _campaign(tmp_path, "a.json",
                      [(_run(1, 400.0), _run(4, 160.0, steal=0.028), 0.625)])
        r = merge([p])
        assert r["pair_efficiencies"] == [0.625]

    def test_refuses_mixed_corpora(self, tmp_path):
        import json

        p1 = _campaign(tmp_path, "a.json",
                       [(_run(1, 400.0), _run(4, 110.0), 0.909)])
        p2 = _campaign(tmp_path, "b.json",
                       [(_run(1, 400.0), _run(4, 110.0), 0.909)])
        d = json.loads(open(p2).read())
        d["corpus_spec"] = "spec-B"
        open(p2, "w").write(json.dumps(d))
        with pytest.raises(SystemExit, match="different corpora"):
            merge([p1, p2])

    def test_refuses_mixed_topologies(self, tmp_path):
        import json

        p1 = _campaign(tmp_path, "a.json",
                       [(_run(1, 400.0), _run(4, 110.0), 0.909)])
        p2 = _campaign(tmp_path, "b.json",
                       [(_run(1, 400.0), _run(4, 110.0), 0.909)])
        d = json.loads(open(p2).read())
        d["N_2x4"] = d.pop("N_1x4")
        open(p2, "w").write(json.dumps(d))
        with pytest.raises(SystemExit, match="topologies"):
            merge([p1, p2])

    def test_in_progress_checkpoint_record_merges(self, tmp_path):
        """scaling_cluster checkpoints a partial record after every
        pair in the SAME level-key schema as the final one, so a dead
        campaign's pairs pool as-is (the whole point of checkpointing);
        the extra in_progress marker and a None level 'sec' (recomputed
        from runs by merge) must not break pooling."""
        import json

        p1 = _campaign(tmp_path, "done.json",
                       [(_run(1, 400.0), _run(4, 110.0), 0.909)])
        p2 = _campaign(tmp_path, "dead.json",
                       [(_run(1, 420.0), _run(4, 120.0), 0.875)])
        d = json.loads(open(p2).read())
        d["in_progress"] = True
        d["scaling_efficiency"] = 0.875
        d["scaling_efficiency_estimator"] = \
            "median of 1 pairs (campaign incomplete)"
        open(p2, "w").write(json.dumps(d))
        got = merge([p1, p2], regate=True)
        assert got["pair_efficiencies"] == [0.909, 0.875]
        assert got["scaling_efficiency"] == round((0.909 + 0.875) / 2, 3)

    def test_merge_does_not_mutate_inputs(self, tmp_path):
        import json

        p = _campaign(tmp_path, "a.json",
                      [(_run(1, 400.0), _run(4, 110.0), 0.909),
                       (_run(1, 400.0), _run(4, 160.0, steal=0.028), 0.625)])
        before = json.loads(open(p).read())
        snapshot = copy.deepcopy(before)
        merge([p], regate=True)
        assert json.loads(open(p).read()) == snapshot
