"""Round-5 hygiene tests.

VERDICT r04 #1: the driver's BENCH_r04.json came out parsed:null
because bench.py printed one ~5 KB JSON line and the driver's stdout
tail capture kept only the last ~2 KB. The round-5 contract: stdout
gets ONE compact line (<=2 KB) with {metric, value, unit, reps, sf}
plus the 10 slowest keys; the full per-query/spread maps go to
BENCH/bench_r05.json. These tests pin both halves of the contract,
plus tools/bench_compare.py's ability to read every historical shape.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class TestBenchStdoutContract:
    def _fake_timings(self, n: int) -> dict[str, float]:
        # worst-case shape: more keys than the real registry, long
        # names, non-trivial float reprs
        return {
            f"quality_fingerprint_operator_{i:03d}": round(
                0.123 + i * 0.017, 3
            )
            for i in range(n)
        }

    def test_line_under_2kb_with_200_keys(self, tmp_path):
        bench = _load_module("bench_r5_test", os.path.join(ROOT, "bench.py"))
        timings = self._fake_timings(200)
        spread = {k: 0.05 for k in timings}
        out = str(tmp_path / "bench_detail.json")
        line = bench.emit(timings, spread, reps=3, sf_val=0.1, out_path=out)
        assert len(line.encode()) <= 2000
        obj = json.loads(line)
        # the driver-parseable minimum from VERDICT r04 ask #1
        for key in ("metric", "value", "unit", "reps", "sf"):
            assert key in obj, key
        assert obj["unit"] == "sec"
        assert obj["n_queries"] == 200
        assert len(obj["slowest"]) == 10
        # slowest really are the 10 largest
        floor = max(
            v for k, v in timings.items() if k not in obj["slowest"]
        )
        assert min(obj["slowest"].values()) >= floor
        # full maps land in the detail file, values intact
        detail = json.load(open(out))
        assert detail["queries"] == timings
        assert detail["spread"] == spread
        assert detail["value"] == round(sum(timings.values()), 3)

    def test_real_registry_size_fits(self, tmp_path):
        """The line stays under 2 KB at the REAL headline count."""
        bench = _load_module("bench_r5_test2", os.path.join(ROOT, "bench.py"))
        n = len(bench.HEADLINE) + 8  # headroom for extract_8k + growth
        timings = self._fake_timings(n)
        line = bench.emit(
            timings, {k: 0.1 for k in timings}, reps=3, sf_val=0.1,
            out_path=str(tmp_path / "d.json"),
        )
        assert len(line.encode()) <= 2000


class TestBenchCompareShapes:
    def _compare(self):
        return _load_module(
            "bench_compare_r5", os.path.join(ROOT, "tools", "bench_compare.py")
        )

    def test_reads_legacy_full_line(self, tmp_path):
        p = tmp_path / "old.json"
        p.write_text(json.dumps({"metric": "m", "queries": {"a": 1.0}}))
        assert self._compare().load(str(p))["queries"] == {"a": 1.0}

    def test_reads_driver_wrapper(self, tmp_path):
        p = tmp_path / "wrap.json"
        p.write_text(
            json.dumps({"parsed": {"metric": "m", "queries": {"a": 2.0}}})
        )
        assert self._compare().load(str(p))["queries"] == {"a": 2.0}

    def test_reads_compact_line_via_detail_file(self, tmp_path):
        detail = tmp_path / "detail.json"
        detail.write_text(
            json.dumps({"metric": "m", "queries": {"a": 1.0, "b": 2.0}})
        )
        p = tmp_path / "compact.json"
        p.write_text(
            json.dumps(
                {
                    "metric": "m",
                    "value": 3.0,
                    "slowest": {"b": 2.0},
                    "detail": str(detail),
                }
            )
        )
        assert self._compare().load(str(p))["queries"] == {
            "a": 1.0,
            "b": 2.0,
        }

    def test_compact_line_falls_back_to_slowest(self, tmp_path):
        p = tmp_path / "compact.json"
        p.write_text(
            json.dumps(
                {
                    "metric": "m",
                    "value": 3.0,
                    "slowest": {"b": 2.0},
                    "detail": "does/not/exist.json",
                }
            )
        )
        assert self._compare().load(str(p))["queries"] == {"b": 2.0}


class TestRoundHalfAway:
    """ADVICE r04: driver-side resync rounding must match SQL ROUND
    (ties away from zero), not Python's banker's rounding."""

    def test_ties_go_away_from_zero(self):
        from edgar_crawler_spark.queries import _round_half_away

        # exact binary halves — the cases where round() diverges
        assert _round_half_away(0.5, 0) == 1.0
        assert _round_half_away(1.5, 0) == 2.0
        assert _round_half_away(2.5, 0) == 3.0      # round() gives 2
        assert _round_half_away(-2.5, 0) == -3.0    # round() gives -2
        assert _round_half_away(0.25, 1) == 0.3     # round() gives 0.2
        assert _round_half_away(-0.25, 1) == -0.3

    def test_non_ties_bit_identical_to_builtin(self):
        from edgar_crawler_spark.queries import _round_half_away

        # deterministic pseudo-random doubles: non-tie cases must be
        # bit-identical to round() (Decimal(x) is the exact binary
        # value, so only exact decimal halves can differ)
        x = 0.123456789
        for i in range(2000):
            x = (x * 1103515245.0 + 12345.0) % 97.3 - 48.65
            for dp in (2, 6, 9):
                got, want = _round_half_away(x, dp), round(x, dp)
                if got != want:
                    # permitted only at an exact decimal half
                    from decimal import Decimal

                    frac = Decimal(x).scaleb(dp) % 1
                    assert abs(frac) == Decimal("0.5"), (x, dp, got, want)
