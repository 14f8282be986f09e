"""Scaling-efficiency evidence (BASELINE.json north_rule: >=0.8 from N to 4N
executors, evidenced here as local[8] vs local[32] on the same input).

Runs the headline geocode-join page pipeline (extract -> mine -> forward +
reverse geocode joins) at both parallelism levels in separate JVMs, measures
throughput AFTER the reference tables are built (the build is a one-off,
snapshot-committed cost), and writes BENCH/BASELINE.md + BENCH/scaling.json.

Usage:
    python scripts/bench_scaling.py            # orchestrator
    python scripts/bench_scaling.py worker N   # internal: one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

BENCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
SF = float(os.environ.get("GEOSPARK_SCALING_SF", "0.25"))
N_SMALL = int(os.environ.get("GEOSPARK_SCALING_N", "8"))
N_BIG = 4 * N_SMALL
# "executors": N vs 4N separate executor JVMs (local-cluster) — the faithful
# reading of the north rule; "threads": N vs 4N threads in one JVM (local[N])
MODE = os.environ.get("GEOSPARK_SCALING_MODE", "executors")
# per-executor JVM heap for executors mode, SAME in both configs (differing
# per-executor memory between the small and big config would change spill
# behavior and unfair the comparison). Sized so the BIG config fits the
# shared 32-core/128GB host with room for the driver and co-tenants
# (ADVICE r4: a hardcoded 4096 MB x 32 executors would request 128 GB);
# override with GEOSPARK_SCALING_EXEC_MB.
EXEC_MB = int(os.environ.get("GEOSPARK_SCALING_EXEC_MB",
                             str(max(1024, min(2048, 65536 // N_BIG)))))
# optional row tag: record this run under "N->4N (TAG)" instead of
# overwriting the untagged pair — used to keep a fresh quiet-host
# re-measurement side-by-side with a pooled history row (pooling bakes
# contaminated invocations in permanently; a tagged clean pair shows what
# the engine does without the co-tenant tax, without discarding samples)
TAG = os.environ.get("GEOSPARK_SCALING_TAG", "")
PAIR_KEY = f"{N_SMALL}->{N_BIG}" + (f" ({TAG})" if TAG else "")


def worker(cpus: int) -> None:
    import os as _os

    _os.environ.setdefault("GEOSPARK_DRIVER_MEM", "32g")
    from geospark.session import get_spark
    from geospark import benchgen, etl, mine
    from geospark.tables import GeocoderTables

    # IDENTICAL data layout at both parallelism levels: partition counts are
    # sized for the LARGE config and held fixed, so the two runs execute the
    # exact same physical work and only the executor-thread count varies —
    # the cluster analogy is a fixed dataset layout queried by clusters of
    # N and 4N executors. (Scaling partition counts with the small config
    # was measured to *change the work itself*: 49.5 vs 341 core-seconds
    # for the same input.)
    parts = 64
    _os.environ["GEOSPARK_HOUSE_PARTS"] = str(parts)
    if MODE == "executors":
        # The faithful emulation of the north rule's "N and 4N executors":
        # local-cluster[N,1,mem] launches N SEPARATE single-core executor
        # JVMs. A single shared JVM (local[N]) exhibits heap/allocator/
        # memory-bandwidth contention between threads that a real
        # multi-executor cluster does not — measured as ~1.4x per-core CPU
        # inflation from 2 to 8 threads on this host even for
        # embarrassingly parallel stages.
        spark = get_spark(
            f"scaling-{cpus}", master=f"local-cluster[{cpus},1,{EXEC_MB}]",
            shuffle_partitions=parts,
            extra_conf={
                # local-cluster[N,1,mem] sets only the WORKER's advertised
                # capacity; executor JVMs still default to 1 GB heaps
                # (spark.executor.memory), which capped sort memory at
                # ~200 MB/task and spilled ~32 GB per run through the host's
                # ONE disk — 16 concurrent spill streams punish the wide
                # config far more than 4 (profiled, BENCH/scaling_profile
                # .json r5b). Pass the intended heap explicitly; identical
                # in both configs, so per-task memory stays fair.
                "spark.executor.memory": f"{EXEC_MB}m",
                # python workers on executors must resolve the repo package
                "spark.executorEnv.PYTHONPATH": os.path.dirname(BENCH_ROOT),
                # don't stall task launches on cache locality: with one
                # core per executor a 3 s locality wait per wave dwarfs the
                # task itself and punishes the WIDE config systematically
                "spark.locality.wait": "0s",
                # each executor owns ONE core, but an un-pinned JVM sizes
                # GC/JIT/Netty pools from Runtime.availableProcessors() = the
                # host's 32 CPUs — 16 executors then run ~23 parallel GC
                # threads EACH, and the fleet's ~370 GC threads steal cycles
                # from every task (measured: per-core task CPU inflates 1.6x
                # from 4 to 16 JVMs while a low-allocation scan job inflates
                # only ~1.1x). A real cluster doesn't do this: container
                # JVMs are cgroup-aware and size pools from their own core
                # count. Pin to the per-executor core count.
                # +UseG1GC: at ActiveProcessorCount=1 JVM ergonomics select
                # SerialGC, and with a multi-GB heap a single-threaded
                # stop-the-world over a ~1.3 GB young gen ran multi-second
                # pauses (measured: 16-exec runs 112-188 s vs 61-64 s, jcmd
                # confirmed UseSerialGC + 90%-full eden). G1 is the
                # production-recommended collector; its worker pools still
                # size from the pinned 1 CPU, so the one-core cycle budget
                # stays honest.
                "spark.executor.extraJavaOptions":
                    "-XX:ActiveProcessorCount=1 -XX:+UseG1GC",
            })
    else:
        # make the JVM believe it has exactly `cpus` cores: GC / JIT /
        # fork-join thread pools otherwise size themselves for the 32-CPU
        # host in BOTH configs, oversubscribing the small one and adding
        # jitter to the big one — a real N-core executor host wouldn't do
        # either
        _os.environ["GEOSPARK_JAVA_OPTS"] = f"-XX:ActiveProcessorCount={cpus}"
        spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    world_dir = benchgen.ensure_bench_world(BENCH_ROOT, SF)

    osm = etl.load_osm_tables(spark, world_dir)
    struct = {k: v.cache() for k, v in etl.build_struct_tables(spark, osm).items()}
    for v in struct.values():
        v.count()
    tables = GeocoderTables(spark, struct, osm["osm_admin"])
    tables.houses.count(), tables.street_city.count()
    tables.street_gram_df.count(), tables.street_name_prefix.count()
    tables.hn_value_prefix.count(), tables.houses_ranked.count()

    pages = spark.read.parquet(f"{world_dir}/webpages.parquet").repartition(parts).cache()
    n_pages = pages.count()
    # ONE FULL unmeasured warmup run (r5): whole-stage-codegen JIT-compiles
    # independently in EVERY executor JVM, so the old limit(512) warmup (one
    # task on one executor) left the rest of the fleet cold and the first
    # measured run paid interpreted-mode CPU on most JVMs. The cost is per
    # JVM, so it scales WITH executor count and masquerades as a scaling
    # miss: profiled at sf4.0, the same job burned 855 executor-CPU-s on 4
    # JVMs vs 1467 on 16 (1.72x) when run cold, and the gap collapses once
    # warm (scripts/profile_geocode.py, BENCH/scaling_profile.json). A
    # production-scale job (the north rule's 10^12-page regime) runs hours
    # on warm JVMs, so steady-state throughput is the honest measurement —
    # the warmup run is identical to the measured runs and simply discarded.
    mine.geocode_pages(spark, tables, pages).count()

    samples, n_out = [], 0
    runs = int(os.environ.get("GEOSPARK_SCALING_RUNS", "3"))
    for _ in range(runs):
        t0 = time.time()
        n_out = mine.geocode_pages(spark, tables, pages).count()
        samples.append(round(time.time() - t0, 3))
    print(json.dumps({"cpus": cpus, "pages": n_pages, "rows_out": n_out,
                      "seconds_runs": samples,
                      "seconds": min(samples),
                      "pages_per_sec": round(n_pages / min(samples), 1)}))


def main() -> None:
    # INTERLEAVED, SYMMETRIC worker launches (small, big, small, big): the
    # sandbox host has sizeable run-to-run noise (measured 27 s vs 53 s for
    # identical local[16] runs); alternating configs cancels slow drift, and
    # an equal launch count per config avoids biasing the min of whichever
    # side got more draws (ADVICE r3). All samples are pooled per config and
    # BOTH estimators are reported; the PASS claim is based on the MEDIAN —
    # robust to a single lucky/unlucky sample — with the min shown alongside
    # as the least-contaminated estimate of the engine's own cost.
    import statistics

    # bounded wait-for-quiet before each worker launch (VERDICT r5 #1/#5:
    # don't launch a measurement into a co-tenant burst; BENCH_r05 itself
    # ran at launch load 5.27 and self-flagged). If the host never quiets
    # within the bound, proceed anyway — flagged in the recorded gate log.
    quiet_load = float(os.environ.get("GEOSPARK_SCALING_QUIET_LOAD", "4"))
    quiet_wait_s = int(os.environ.get("GEOSPARK_SCALING_QUIET_WAIT_S", "900"))

    def _wait_quiet() -> dict:
        t0 = time.time()
        load = os.getloadavg()[0]
        while load > quiet_load and time.time() - t0 < quiet_wait_s:
            time.sleep(30)
            load = os.getloadavg()[0]
        return {"waited_s": round(time.time() - t0, 1),
                "load_at_launch": round(load, 2), "quiet": load <= quiet_load}

    samples: dict[int, list[float]] = {N_SMALL: [], N_BIG: []}
    retries: dict[int, int] = {N_SMALL: 0, N_BIG: 0}
    launch_gate: list[dict] = []
    pages = rows_out = 0
    for cpus in (N_SMALL, N_BIG, N_SMALL, N_BIG):
        gate = _wait_quiet()
        launch_gate.append({"cpus": cpus, **gate})
        # a worker is a 10-50 min subprocess; a transient failure (executor
        # OOM under a co-tenant burst, shuffle-dir blip) used to abort the
        # whole multi-hour invocation with the worker's stderr swallowed by
        # capture_output + check=True. Surface the tail and retry once —
        # samples already collected stay paid-for. Retries are COUNTED in
        # the pair dict (ADVICE r5: a retried pair must be distinguishable
        # from a clean symmetric one), and a short sleep lets orphaned
        # executor JVMs / shuffle dirs from the crashed attempt drain
        # before the retry contends with them (ADVICE r5).
        for attempt in (1, 2):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker", str(cpus)],
                capture_output=True, text=True, cwd=os.path.dirname(BENCH_ROOT))
            if out.returncode == 0:
                break
            retries[cpus] += 1
            tail = "\n".join(out.stderr.splitlines()[-30:])
            print(f"worker {cpus} attempt {attempt} failed (rc={out.returncode}):\n{tail}",
                  file=sys.stderr)
            time.sleep(20)
        else:
            # persist the paid-for samples before dying (ADVICE r5: the old
            # raise discarded every earlier measurement of this invocation)
            partial_path = os.path.join(BENCH_ROOT, "scaling_partial.json")
            with open(partial_path, "w") as fp:
                json.dump({"pair": PAIR_KEY, "sf": SF, "exec_mb": EXEC_MB,
                           "samples": {str(k): v for k, v in samples.items()},
                           "retries": {str(k): v for k, v in retries.items()}},
                          fp, indent=1)
            raise RuntimeError(
                f"worker {cpus} failed twice; aborting (stderr above; partial "
                f"samples saved to {partial_path})")
        json_lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not json_lines:
            # rc=0 but no JSON line used to die as an opaque IndexError
            raise RuntimeError(
                f"worker {cpus} rc=0 but printed no JSON line; stdout tail:\n"
                + out.stdout[-800:])
        r = json.loads(json_lines[-1])
        samples[cpus].extend(r["seconds_runs"])
        pages, rows_out = r["pages"], r["rows_out"]
        print(json_lines[-1])

    if os.environ.get("GEOSPARK_SCALING_POOL") == "1":
        # pool with the SAME pair's runs from a previous invocation of the
        # SAME engine + protocol (sf / exec_mb / pages must match — a pool
        # across engine versions or workload sizes would be meaningless).
        # Used when the two estimators disagree on a 6-sample run (ADVICE
        # r4: collect enough samples that they agree before claiming a
        # verdict) — another symmetric 6 samples doubles the pool without
        # discarding paid-for measurements.
        try:
            old_pair = json.load(open(os.path.join(BENCH_ROOT, "scaling.json")))[
                "pairs"][PAIR_KEY]
            if (old_pair.get("sf") == SF and old_pair.get("pages") == pages
                    and old_pair.get("exec_mb") == (EXEC_MB if MODE == "executors" else None)):
                for n in (N_SMALL, N_BIG):
                    prev = old_pair[f"local[{n}]"]["runs"]
                    samples[n] = prev + samples[n]
                    print(f"pooled {len(prev)} prior local[{n}] runs")
            else:
                print("pool requested but prior pair protocol differs — not pooling")
        except (OSError, KeyError, json.JSONDecodeError) as exc:
            print(f"pool requested but prior pair unreadable ({exc}) — not pooling")

    est = {}
    for cpus, runs in samples.items():
        est[cpus] = {"runs": runs, "min": min(runs),
                     "median": round(statistics.median(runs), 3),
                     "pages_per_sec_min": round(pages / min(runs), 1),
                     "pages_per_sec_median": round(pages / statistics.median(runs), 1)}
    ratio = N_BIG / N_SMALL
    eff_min = est[N_SMALL]["min"] / est[N_BIG]["min"] / ratio
    eff_med = est[N_SMALL]["median"] / est[N_BIG]["median"] / ratio
    pair = {
        "sf": SF,
        "exec_mb": EXEC_MB if MODE == "executors" else None,
        "pages": pages,
        "rows_out": rows_out,
        f"local[{N_SMALL}]": est[N_SMALL],
        f"local[{N_BIG}]": est[N_BIG],
        "scaling_efficiency_min": round(eff_min, 3),
        "scaling_efficiency_median": round(eff_med, 3),
        "target": 0.8,
        # BOTH estimators' verdicts disclosed (ADVICE r4: a headline that
        # flips with the estimator choice must show both); the median-based
        # one carries the claim (robust to a single noise burst, ADVICE r3)
        "pass_median": eff_med >= 0.8,
        "pass_min": eff_min >= 0.8,
        "pass": eff_med >= 0.8,
        # measurement provenance (ADVICE r5 + VERDICT r5 #5): per-config
        # worker retry counts and the per-launch quiet-gate record
        "retries": {str(k): v for k, v in retries.items()},
        "launch_gate": launch_gate,
    }
    os.makedirs(BENCH_ROOT, exist_ok=True)
    scaling_path = os.path.join(BENCH_ROOT, "scaling.json")
    summary = {
        "job": "geocode_pages (extract -> mine -> forward+reverse geocode join)",
        "mode": MODE,
        "pairs": {},
    }
    if os.path.exists(scaling_path):
        try:
            old = json.load(open(scaling_path))
            # accumulate measured pairs across invocations (r5: the scaling
            # table carries one row per doubling, not just the last run)
            summary["pairs"] = old.get("pairs", {})
        except (json.JSONDecodeError, OSError):
            pass
    summary["pairs"][PAIR_KEY] = pair
    with open(scaling_path, "w") as fp:
        json.dump(summary, fp, indent=1)
    # preserve hand-written sections below the scaling block (quiet-host
    # reference line, timing methodology, workload-redefinition notes, ...)
    # across rewrites — everything after the explicit marker survives
    MARKER = "<!-- hand-maintained below: bench_scaling.py preserves from here -->"
    extra = ""
    baseline_path = os.path.join(BENCH_ROOT, "BASELINE.md")
    if os.path.exists(baseline_path):
        old = open(baseline_path).read()
        cut = old.find(MARKER)
        if cut < 0:
            cut = old.find("\n## Timing methodology")
            if cut >= 0:
                # no marker yet: adopt the tail and PUT one in front of it so
                # the next rewrite preserves from the same place
                extra = "\n" + MARKER + "\n" + old[cut:]
        if cut >= 0 and not extra:
            # keep the marker itself in the rewritten file — stripping it
            # made the SECOND rewrite fall back and drop hand-written
            # sections between the headline block and ## Timing methodology
            extra = old[cut:]
    import re

    pair_rows, verdict_lines = [], []

    def _lo_hi(pname: str) -> tuple[int, int]:
        m = re.match(r"(\d+)->(\d+)", pname)  # tagged keys: "4->16 (quiet)"
        return int(m.group(1)), int(m.group(2))

    for pname, p in sorted(summary["pairs"].items(), key=lambda kv: _lo_hi(kv[0])):
        lo, hi = _lo_hi(pname)
        for n in (lo, hi):
            e = p[f"local[{n}]"]
            pair_rows.append(
                f"| {pname} | sf={p['sf']} | local[{n}] | {e['runs']} | "
                f"{e['min']} | {e['median']} | {e['pages_per_sec_median']} |")
        verdict_lines.append(
            f"* **{pname} ({hi // lo}x cores, sf={p['sf']}): median-based "
            f"{p['scaling_efficiency_median']} "
            f"({'PASS' if p['pass_median'] else 'FAIL'}), min-based "
            f"{p['scaling_efficiency_min']} "
            f"({'PASS' if p['pass_min'] else 'FAIL'})** — target ≥ 0.8, both "
            "estimators' verdicts disclosed (ADVICE r4); the median carries "
            "the claim (robust to single noise bursts, ADVICE r3).")
    with open(baseline_path, "w") as fp:
        fp.write(f"""# BENCH/BASELINE — measured numbers for this engine

## Scaling efficiency (north_rule: >=0.8 from N to 4N executors)

Evidenced on the 32-core sandbox host as the same job at two parallelism
levels (no real cluster available): mode **{MODE}** —
{'`local-cluster[N,1,exec_mb]` pairs (separate single-core executor JVMs, the faithful N-vs-4N-executors emulation; per-executor heap identical in both configs of a pair — per-pair exec_mb in BENCH/scaling.json)' if MODE == 'executors' else '`local[N]` pairs (threads in one JVM)'},
identical input per pair (sf-scaled synthetic world), measuring the
geocode-join page pipeline after the one-off reference-table build.
One row per measured config, one pair per doubling-pushed measurement:

| pair | input | config | samples (s) | min (s) | median (s) | pages/sec (median) |
|---|---|---|---|---|---|---|
{chr(10).join(pair_rows)}

{chr(10).join(verdict_lines)}

Methodology notes:

* Identical physical layout at both levels (fixed partition counts); only the
  executor-thread count varies — the cluster analogy is one dataset layout
  queried by clusters of N and 4N executors.
* Interleaved, SYMMETRIC worker launches (N, 4N, N, 4N), 3 measured runs per
  worker, all samples pooled per config — the sandbox host shows large
  run-to-run noise, so no single sample (and no per-config best over
  unequal launch counts) carries the claim. When the two estimators
  disagree on a 6-sample invocation (ADVICE r4: collect enough samples
  that they agree), GEOSPARK_SCALING_POOL=1 reruns the same symmetric
  protocol and pools with the prior invocation's runs (same engine, same
  sf/exec_mb/pages enforced) — sample counts per config stay equal.
* STEADY-STATE protocol (r5): each worker runs the full job once unmeasured
  before its measured runs. Whole-stage-codegen JIT-compiles per executor
  JVM, so cold-fleet CPU scales with executor count (profiled: 855
  executor-CPU-s on 4 JVMs vs 1467 on 16 for the same cold job, 1.72x) and
  reads as a scaling miss that a warm production fleet would not show. Pairs
  measured before r5 used a 1-task warmup and mix cold+warm samples.
* CGROUP-FAITHFUL executor JVMs (r5): executors run with
  `-XX:ActiveProcessorCount=1` (their actual core count). Un-pinned, every
  executor sizes GC/JIT/Netty pools from the host's 32 CPUs — a 16-executor
  fleet runs ~370 parallel GC threads whose cycle-stealing inflated
  per-core task CPU 1.6x vs 4 executors (BENCH/scaling_profile.json); real
  cluster containers are cgroup-aware and never do this. With the pin, a
  zero-engine-code allocation-heavy job scales 4->16 at 0.916 median
  (BENCH/host_spark_ceiling.json) — the box is not the limiter.
* Pairs are chosen inside the host's linear regime:
  `python scripts/host_ceiling.py` (BENCH/host_ceiling.json) measures the
  box's PURE-CPU multiprocessing scaling; at 24-32 concurrent threads the
  per-thread speed drops to ~67-82% of single-thread speed across runs
  (shared-host contention), so an 8→32 pair measures the neighbours as much
  as the engine, while 2→8 and 4→16 sustain ~0.94-0.95 even for perfectly
  parallel work.

## Headline throughput

Geocode-join throughput (pages/sec over the web-page table, the
BASELINE.json metric): **{est[N_BIG]['pages_per_sec_median']} pages/sec**
(median; {est[N_BIG]['pages_per_sec_min']} best-sample) at local[{N_BIG}],
sf={SF}. Reference publishes no query-throughput numbers (BASELINE.md);
its build-pipeline numbers are in the repo-root BASELINE.md.

Per-query timings for the full suite are in BENCH_r*.json (driver-recorded,
`python bench.py`).
""")
        fp.write(extra)
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        main()
