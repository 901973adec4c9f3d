"""Deviceless multi-chip schedule machinery (tools/aot_schedule_study.py +
parallel.sharded.aot_lower_sharded_step).

The full v5e-topology AOT compile runs ~15 min and needs the TPU compiler
service, so the compile itself is exercised by the tool (artifact:
docs/validation/aot_schedule.json); here we pin the schedule analyzer on a
representative scheduled-HLO snippet and check the artifact's invariants.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from tools.aot_schedule_study import analyze_schedule

SNIPPET = """
ENTRY %main () -> f32[] {
  %collective-permute-start.3 = (f32[130,142]{0,1:T(8,128)}, f32[130,142]{0,1:T(8,128)}, u32[]{:S(2)}, u32[]{:S(2)}) collective-permute-start(%multiply_bitcast_fusion.17), channel_id=1
  %fusion.1 = f32[8,128]{1,0} fusion(%p0), kind=kLoop
  %fusion.2 = f32[8,128]{1,0} fusion(%fusion.1), kind=kLoop
  %fusion.3 = f32[8,128]{1,0} fusion(%fusion.2), kind=kLoop
  %collective-permute-done.3 = f32[130,142]{0,1:T(8,128)} collective-permute-done(%collective-permute-start.3)
  %collective-permute-start.4 = (f32[2,2]{0,1}, f32[2,2]{0,1}, u32[], u32[]) collective-permute-start(%fusion.3), channel_id=2
  %collective-permute-done.4 = f32[2,2]{0,1} collective-permute-done(%collective-permute-start.4)
}
"""


def test_analyzer_counts_inflight_compute():
    pairs = analyze_schedule(SNIPPET)
    assert sorted(pairs) == [0, 3]


import pytest


@pytest.mark.parametrize("fname", ["aot_schedule.json",
                                   "aot_schedule_x1163842.json"])
def test_artifact_invariants(fname):
    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "validation", fname)
    if not os.path.exists(path):
        pytest.skip(f"{fname} not generated in this checkout")
    data = json.load(open(path))
    # round-5 format: one entry per studied topology (2x2 / 2x4 / 4x4)
    arts = data["topologies"] if "topologies" in data else [data]
    assert len(arts) >= 1
    for art in arts:
        assert art["collective_permute_start"] == art["collective_permute_done"]
        assert art["pairs_analyzed"] > 0
        # every analyzed halo collective is scheduled with compute in flight
        assert art["pairs_with_compute_in_flight"] == art["pairs_analyzed"]
        assert art["ops_between_start_done"]["median"] > 0
        # the scaling budget's collective accounting must agree with the
        # compiled schedule (round-5: the cross-check VERDICT item 6 asks for)
        if "budget_predicted_collectives" in art:
            assert art["budget_matches_schedule"], art
