"""bench_compare.py: regime rule + historical band detector (pure python,
no Spark). The regime rule is the r10 canary calibration lesson as
executable behavior; --bands is the ratchet detector the one-round-back
protocol lacked (r10: five keys compounded 2-3.3x through two rounds of
'in band' closings)."""

import json
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench_compare  # noqa: E402


def _write(path, queries, host_factor=None):
    doc = {"queries": queries, "sf": 0.1}
    if host_factor is not None:
        doc["canary"] = {"host_factor": host_factor}
    path.write_text(json.dumps(doc))
    return str(path)


BASE = {f"q{i}": 1.0 for i in range(10)}


class TestTailReconstruction:
    def test_write_canary_fields_not_parsed_as_queries(self, tmp_path):
        """The driver-wrapper 'tail' fallback reconstructs queries from
        key:number pairs; the r12 write-canary fields must be excluded or
        they surface as phantom bench keys (write_pre_sec etc.)."""
        tail = (
            '_dedup": 1.23, "bucket_write": 2.5}, "sf": 0.1, "canary": '
            '{"pre_sec": 2.0, "post_sec": 2.1, "ref_sec": 2.36, '
            '"host_factor": 0.87, "write_pre_sec": 1.4, '
            '"write_post_sec": 1.6, "write_ref_sec": 1.5, '
            '"write_factor": 1.0, "smallfiles_pre_sec": 1.7, '
            '"smallfiles_post_sec": 1.8, "smallfiles_ref_sec": 1.65, '
            '"smallfiles_factor": 1.06}}'
        )
        p = tmp_path / "wrapped.json"
        p.write_text(json.dumps({"tail": tail}))
        side = bench_compare.load_bench(str(p))
        assert side["queries"].get("bucket_write") == 2.5
        assert not any(
            k.startswith(("write_", "smallfiles_")) for k in side["queries"]
        )
        assert side["host_factor"] == 0.87
        assert side["truncated"]


class TestRegime:
    def _pick(self, qa, qb, fa, fb):
        a = {"queries": qa, "host_factor": fa}
        b = {"queries": qb, "host_factor": fb}
        shared = sorted(set(qa) & set(qb))
        return bench_compare.pick_regime(a, b, shared)

    def test_same_day_small_divergence_stays_raw(self):
        # totals diverge < 1.2x: factor noise would overcorrect
        qb = {k: v * 1.05 for k, v in BASE.items()}
        regime, reason = self._pick(BASE, qb, 1.0, 1.3)
        assert regime == "raw"
        assert "1.2x" in reason

    def test_uniform_large_shift_adjusts(self):
        # every key 1.5x: the co-tenant signature — trust the factor
        qb = {k: v * 1.5 for k, v in BASE.items()}
        regime, reason = self._pick(BASE, qb, 1.0, 1.5)
        assert regime == "adjusted"
        assert "uniform" in reason

    def test_key_specific_shift_stays_raw(self):
        # half the keys 3x, half flat: code moved keys, not the host
        qb = dict(BASE)
        for i in range(5):
            qb[f"q{i}"] = 3.0
        regime, reason = self._pick(BASE, qb, 1.0, 1.5)
        assert regime == "raw"
        assert "NOT uniform" in reason

    def test_missing_canary_stays_raw(self):
        qb = {k: v * 1.5 for k, v in BASE.items()}
        regime, reason = self._pick(BASE, qb, None, 1.5)
        assert regime == "raw"
        assert "no canary" in reason


class TestBands:
    def _run(self, args, cwd):
        return subprocess.run(
            [sys.executable, "/root/repo/bench_compare.py", *args],
            capture_output=True, text=True, cwd=cwd,
        )

    @pytest.fixture()
    def history(self, tmp_path):
        # 4 stable rounds, then a round where one key ratchets to 3x
        for r in range(1, 5):
            _write(tmp_path / f"BENCH_r0{r}.json",
                   {"stable": 1.0 + 0.02 * r, "ratchet": 0.8 + 0.05 * r})
        _write(tmp_path / "BENCH_r05.json", {"stable": 1.05, "ratchet": 2.7})
        return tmp_path

    def test_breach_flagged_and_exit_2(self, history):
        p = self._run(["--bands"], cwd=str(history))
        assert p.returncode == 2
        assert "BAND BREACHES" in p.stdout
        breach_block = p.stdout.split("BAND BREACHES")[1]
        # only the ratcheted key is flagged; the stable key is not
        assert "ratchet" in breach_block
        assert "stable:" not in breach_block
        # the target's own value is excluded from its band: the history
        # medians are 0.85-1.0 (not pulled up by the 2.7 target value)
        assert "median 0.9" in p.stdout

    def test_clean_history_exits_0(self, history):
        # target an earlier, in-band artifact explicitly
        p = self._run(["--bands", str(history / "BENCH_r04.json")],
                      cwd=str(history))
        assert p.returncode == 0
        assert "no band breaches" in p.stdout

    def test_new_key_reported_not_flagged(self, history):
        _write(history / "BENCH_r06.json",
               {"stable": 1.0, "ratchet": 0.9, "brand_new": 9.9})
        p = self._run(["--bands", str(history / "BENCH_r06.json")],
                      cwd=str(history))
        assert p.returncode == 0
        assert "brand_new" in p.stdout and "too new" in p.stdout


class TestTwoArtifactRegimeOutput:
    def test_regime_line_printed(self, tmp_path):
        a = _write(tmp_path / "BENCH_r01.json", BASE, host_factor=1.0)
        b = _write(tmp_path / "BENCH_r02.json",
                   {k: v * 1.5 for k, v in BASE.items()}, host_factor=1.5)
        p = subprocess.run(
            [sys.executable, "/root/repo/bench_compare.py", a, b],
            capture_output=True, text=True,
        )
        assert p.returncode == 0
        assert p.stdout.startswith("regime: ADJUSTED")
        # adjusted totals cancel the uniform shift
        assert "adjusted:" in p.stdout
