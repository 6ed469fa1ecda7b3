"""Headline benchmark: runs every bench-flagged registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Queries are materialized through the noop sink — full distributed
execution, no driver-side collect bottleneck in the measurement.

Regression tracking: per-query timings are compared against the
best-recorded run in BENCH_BASELINE.json (ambient-load swings inflate
every query uniformly, so only PER-QUERY ratios against the best run
can expose a real regression). Queries slower than REGRESSION_FACTOR ×
their best go to stderr as warnings; the baseline file auto-updates
with new personal bests. Delete the file to re-baseline."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from website_traffic_etl_gcp_spark import plans
from website_traffic_etl_gcp_spark.session import get_spark

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
)
REGRESSION_FACTOR = 1.5
GLOBAL_BACKSTOP_FACTOR = 2.5


def _check_regressions(
    timings: dict[str, float],
    sf: float,
    families: dict[str, tuple[str, ...]] | None = None,
) -> list[str]:
    """Compare against (and fold new bests into) the recorded baseline.
    Returns the regression warnings it printed.

    Ratios are normalized by the run's MEDIAN drift vs the best-fold:
    ambient cross-boot variance slows every query by the same factor
    (measured up to ~2× between VM boots), which made absolute ratios
    flag disjoint phantom sets on consecutive same-boot runs. A real
    plan regression moves alone, so its drift-normalized ratio still
    exceeds the threshold while uniform slowdown cancels out.

    Drift is NOT uniform across query families, though: shuffle-heavy
    tiers drift ~1.9× between boots while the median query drifts
    ~1.16× (the r11 `dedup_incremental_minhash` flag read 2.10×
    GLOBAL-drift-normalized yet the paired same-boot A/B in
    DEDUP_AB_R12.json measured the r11 tree FASTER than r10 — a pure
    ambient artifact). So each query is normalized by the median drift
    of its TAG FAMILY when the family has ≥3 baselined peers (a real
    single-query regression still flags: its peers stay at ambient),
    with a wider GLOBAL-drift backstop (2.5×, above the worst measured
    family-wide ambient band) so a regression hitting a whole family's
    shared operator cannot hide behind its own family median.

    Adjudication ledger: a flag that a paired same-boot A/B artifact
    has pinned as ambient (baseline key ``adjudicated``) is reported
    as AMBIENT instead of REGRESSION — but ONLY while the reading
    stays at or under the ambient ceiling the A/B itself measured
    (``ambient_ceiling_sec``); anything slower than the adjudicating
    evidence still fires. The suppression is loud (stderr + the
    ``ambient_adjudicated`` list in the output JSON), never silent."""
    baseline: dict = {}
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)
    best: dict[str, float] = baseline.get("best", {})
    adjudicated: dict[str, dict] = baseline.get("adjudicated", {})
    warnings = []
    ambient_notes = _check_regressions.ambient_adjudicated = []
    if baseline.get("sf") == sf:
        ratios = {
            name: t / best[name]
            for name, t in timings.items()
            if best.get(name)
        }
        if ratios:
            def _median(vals: list[float]) -> float:
                return sorted(vals)[len(vals) // 2]

            drift = max(1.0, _median(list(ratios.values())))
            fam_drift: dict[tuple[str, ...], float] = {}
            for name in ratios:
                fam = (families or {}).get(name)
                if fam is None or fam in fam_drift:
                    continue
                peers = [
                    r
                    for n, r in ratios.items()
                    if (families or {}).get(n) == fam
                ]
                if len(peers) >= 3:
                    fam_drift[fam] = max(1.0, _median(peers))
            for name, r in ratios.items():
                fd = fam_drift.get((families or {}).get(name), drift)
                fam_flag = r / fd > REGRESSION_FACTOR
                global_flag = r / drift > GLOBAL_BACKSTOP_FACTOR
                if fam_flag or global_flag:
                    adj = adjudicated.get(name)
                    msg = (
                        f"{name}: {timings[name]:.3f}s vs best "
                        f"{best[name]:.3f}s ({r:.2f}x raw, {r / fd:.2f}x "
                        f"family-drift-normalized at family drift "
                        f"{fd:.2f}x, {r / drift:.2f}x global-normalized "
                        f"at boot drift {drift:.2f}x; thresholds "
                        f"{REGRESSION_FACTOR}x family / "
                        f"{GLOBAL_BACKSTOP_FACTOR}x global)"
                    )
                    if adj and timings[name] <= adj["ambient_ceiling_sec"]:
                        ambient_notes.append(
                            f"AMBIENT (adjudicated {adj['artifact']}, "
                            f"ceiling {adj['ambient_ceiling_sec']}s) {msg}"
                        )
                    else:
                        warnings.append(f"REGRESSION {msg}")
    for w in warnings + ambient_notes:
        print(w, file=sys.stderr)
    if baseline and baseline.get("sf") != sf:
        # an off-SF run (e.g. a local sf1 deep-dive) must not clobber
        # the recorded best-fold at the canonical bench SF
        return warnings
    merged = dict(best)
    merged.update(
        {name: min(t, best.get(name, t)) for name, t in timings.items()}
    )
    out = {"sf": sf, "best": merged}
    if adjudicated:
        out["adjudicated"] = adjudicated
    with open(BASELINE_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    return warnings


def _run_suite(spark, specs, sf_dir: str, repeats: int = 1) -> dict[str, float]:
    """Per-query wall clock through the noop sink; with ``repeats`` > 1
    the best of N is kept — single-shot numbers on a shared box carry
    ambient-load noise that shows up as phantom regressions."""
    timings: dict[str, float] = {}
    for spec in specs:
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[spec.name] = round(best, 3)
    return timings


def _scaling_report(spark, specs) -> None:
    """Measure each headline query at sf0.01 and sf0.1 (10× the rows)
    and report the wall-clock ratio. On fixed local[32] a scale-safe
    plan grows at most ~linearly (ratio ≲ 10, usually far below since
    fixed overheads amortize); a super-linear ratio flags a plan whose
    work grows faster than its input — the 100× red flag. Results land
    in BENCH_SCALING.json. Dirs honor the same env contract as the
    headline run: hi = $SPARK_GRAFT_SF_DIR, lo = $SPARK_GRAFT_SF_DIR_LO
    (default: the sf0.01 sibling of hi)."""
    hi_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR_LO",
        os.path.join(os.path.dirname(hi_dir.rstrip("/")), "sf0.01"),
    )

    def _sf(d: str) -> float:
        try:
            return float(d.rstrip("/").rsplit("sf", 1)[-1])
        except ValueError:
            raise SystemExit(
                f"--scaling needs sf<value>-suffixed dirs to derive the "
                f"data ratio; got {d!r} (set SPARK_GRAFT_SF_DIR[_LO])"
            )

    # validate BEFORE the multi-minute warm+measure passes
    sf_lo, sf_hi = _sf(lo_dir), _sf(hi_dir)
    if not sf_lo or sf_hi <= sf_lo:
        raise SystemExit(
            f"--scaling needs sf_hi > sf_lo > 0; got {sf_lo} → {sf_hi}"
        )
    data_ratio = sf_hi / sf_lo

    for d in (lo_dir, hi_dir):  # warm BOTH paths (file cache + codegen)
        for spec in specs:
            spec.builder(spark, d).write.format("noop").mode("overwrite").save()
    # best-of-2 for the same phantom-regression reason as the headline
    lo = _run_suite(spark, specs, lo_dir, repeats=2)
    hi = _run_suite(spark, specs, hi_dir, repeats=2)
    ratios = {
        n: round(hi[n] / lo[n], 2) if lo[n] > 0 else None for n in lo
    }
    out = {
        "sf_lo": sf_lo,
        "sf_hi": sf_hi,
        "data_ratio": data_ratio,
        "sec_lo": lo,
        "sec_hi": hi,
        "time_ratio": ratios,
        "superlinear": sorted(
            n for n, r in ratios.items() if r and r > data_ratio
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = [s for s in plans.REGISTRY.values() if s.bench]
    # SPARK_GRAFT_BENCH_ONLY=a,b,c: iterate on a subset with the same
    # warmup protocol. Subset runs skip baseline folding AND regression
    # detection (drift normalization needs the full suite's median).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        specs = [s for s in specs if s.name in names]

    if "--scaling" in sys.argv:
        _scaling_report(spark, specs)
        return

    timings: dict[str, float] = {}
    # JVM JIT + codegen warmup: run the whole suite once at the
    # smallest SF so measured timings reflect steady-state execution,
    # not first-call compilation
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for spec in specs:
            spec.builder(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    # ...then once at the MEASUREMENT sf_dir: index-backed queries
    # (persisted minhash/IVF/PQ tables are keyed by sf_dir) build
    # their index on first touch per corpus, and that one-time build
    # cost is not the steady-state probe cost being measured — the
    # r7 flags (dedup_incremental_minhash 5.3×) were exactly this
    # first-touch build landing inside the timed window
    for spec in specs:
        spec.builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timings = _run_suite(spark, specs, sf_dir, repeats=2)

    if only:
        warnings: list[str] = []
    else:
        warnings = _check_regressions(
            timings,
            float(sf),
            families={s.name: tuple(sorted(s.tags)) for s in specs},
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "regressions": warnings,
                "ambient_adjudicated": getattr(
                    _check_regressions, "ambient_adjudicated", []
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
