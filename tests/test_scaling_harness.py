"""Unit tests for the scaling harness's HLO collective-volume parser."""
import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "scaling_bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "scaling_bench.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
collective_bytes = _mod.collective_bytes


def test_collective_bytes_basic():
    hlo = """
  %ag = f32[2048,64]{1,0} all-gather(f32[256,64]{1,0} %x), dimensions={0}
  %ar = f32[4]{0} all-reduce(f32[4]{0} %y), to_apply=%add
  %rs = bf16[128,32]{1,0} reduce-scatter(bf16[1024,32]{1,0} %z), dimensions={0}
  %mm = f32[128,128]{1,0} dot(f32[128,128]{1,0} %a, f32[128,128]{1,0} %b)
"""
    got = collective_bytes(hlo)
    assert got["all-gather"] == 2048 * 64 * 4
    assert got["all-reduce"] == 4 * 4
    assert got["reduce-scatter"] == 128 * 32 * 2
    assert "dot" not in got and len(got) == 3


def test_collective_bytes_tuple_and_start():
    hlo = """
  %t = (s32[96]{0}, s32[96]{0}) all-gather-start(s32[12]{0} %a, s32[12]{0} %b)
  %cp = f32[8,128]{1,0} collective-permute(f32[8,128]{1,0} %x)
"""
    got = collective_bytes(hlo)
    assert got["all-gather"] == 2 * 96 * 4
    assert got["collective-permute"] == 8 * 128 * 4


def test_collective_bytes_empty():
    assert collective_bytes("%x = f32[4]{0} add(f32[4] %a, f32[4] %b)") == {}


def test_collective_ops_group_sizes():
    hlo = """
  %ag = f32[2048,64]{1,0} all-gather(f32[256,64]{1,0} %x), replica_groups=[1,8]<=[8], dimensions={0}
  %rs = bf16[128,32]{1,0} reduce-scatter(bf16[1024,32]{1,0} %z), replica_groups={{0,1,2,3},{4,5,6,7}}, dimensions={0}
"""
    ops = _mod.collective_ops(hlo)
    assert ops[0]["kind"] == "all-gather" and ops[0]["group"] == 8
    assert ops[1]["kind"] == "reduce-scatter" and ops[1]["group"] == 4


def test_traffic_bytes_ring_factors():
    t = _mod._traffic_bytes
    # group of 1: no traffic
    assert t("all-gather", 1000, 1) == 0.0
    # ring all-gather: out*(G-1)/G
    assert t("all-gather", 800, 4) == 800 * 3 / 4
    # reduce-scatter: out is the 1/G shard -> out*(G-1)
    assert t("reduce-scatter", 100, 4) == 300
    # all-reduce = RS + AG on same-size data
    assert t("all-reduce", 800, 4) == 2 * 800 * 3 / 4
    assert t("collective-permute", 640, 8) == 640
