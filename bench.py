#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "stream": {"turns": N, "throughput_local8": t/s, "throughput_local32": t/s,
              "scaling_efficiency": eff, ...}}

- Batch: headline operator queries from __spark_entry__ at
  $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
  local[$SPARK_GRAFT_CPUS]; each timed with a noop sink so Catalyst
  cannot prune the measured work.
- Streaming: the full CEP pipeline (enrich + stateful dedup +
  sessionize + stream-stream join + tumbling-window rates,
  exactly-once sinks) over a
  deterministic generated transcript table, run at local[8] and
  local[32] in separate JVMs on the SAME input — the sandbox evidence
  for the north rule's N→4N executor scaling criterion
  (BASELINE.md): efficiency = (thr_32 / thr_8) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
STREAM_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "1500"))
STREAM_TURNS_PER_CONV = int(os.environ.get("SPARK_GRAFT_BENCH_TPC", "64"))
BENCH_TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/spamscope_bench")

HEADLINE = [
    "q_pricing_summary",
    "q_top_customers",
    "q_region_rollup",
    "q_order_rank_window",
    "q_sessionize_events",
    "q_tumbling_window",
    "q_time_band_join",
    "q_asof_join",
    "q_phishing_score",
    "q_url_extract",
    "q_dedup_exact",
    "q_minhash_lsh",
    "q_ngram_jaccard",
    "q_simhash",
    "q_cosine_topk",
    "q_media_features",
    "q_wordcount",
    "q_range_window",
    "q_part_revenue",
    "q_turns_flagship",
]


def _session(cpus: int, app: str):
    from spamscope_spark.config import build_session

    return build_session(
        app_name=app,
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
        extra={"spark.ui.showConsoleProgress": "false"},
    )


def run_batch() -> dict:
    import __spark_entry__ as em

    spark = _session(CPUS, "bench-batch")
    qs = em.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()
    return timings


def stream_worker(cpus: int, input_path: str, work_dir: str) -> dict:
    """Run the three streaming queries (enriched/sessions/join) over the
    given input; return wall-clock + throughput. Runs in its own JVM."""
    from spamscope_spark.streaming.pipeline import (
        PipelineConfig,
        start_enriched_query,
        start_join_query,
        start_session_query,
        start_window_query,
    )

    spark = _session(cpus, f"bench-stream-{cpus}")
    n_turns = spark.read.parquet(input_path).count()
    cfg = PipelineConfig(input_path=input_path, work_dir=work_dir)
    t0 = time.time()
    q1, _ = start_enriched_query(spark, cfg)
    q2, _ = start_session_query(spark, cfg)
    q3, _ = start_join_query(spark, cfg)
    q4, _ = start_window_query(spark, cfg)
    for q in (q1, q2, q3, q4):
        q.awaitTermination()
    wall = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "turns": n_turns,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
    }


def prepare_stream_input(path: str) -> None:
    from spamscope_spark.datagen import generate_turns

    spark = _session(CPUS, "bench-datagen")
    (
        generate_turns(
            spark, n_convs=STREAM_CONVS, turns_per_conv=STREAM_TURNS_PER_CONV
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(path)
    )
    spark.stop()


def run_stream_scaling() -> dict:
    input_path = os.path.join(BENCH_TMP, "turns_in")
    if os.path.exists(BENCH_TMP):
        shutil.rmtree(BENCH_TMP)
    prepare_stream_input(input_path)
    results = {}
    for cpus in (8, 32):
        work_dir = os.path.join(BENCH_TMP, f"work_{cpus}")
        out = subprocess.run(
            [
                sys.executable, __file__, "--stream-worker",
                str(cpus), input_path, work_dir,
            ],
            capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise RuntimeError(f"stream worker local[{cpus}] failed")
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    thr8 = results[8]["turns_per_sec"]
    thr32 = results[32]["turns_per_sec"]
    return {
        "turns": results[32]["turns"],
        "wall_sec_local8": results[8]["wall_sec"],
        "wall_sec_local32": results[32]["wall_sec"],
        "throughput_local8": thr8,
        "throughput_local32": thr32,
        "scaling_efficiency": round((thr32 / thr8) / 4.0, 3),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--stream-worker":
        res = stream_worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        print(json.dumps(res))
        return
    skip_stream = os.environ.get("SPARK_GRAFT_BENCH_NO_STREAM") == "1"
    timings = run_batch()
    stream = None if skip_stream else run_stream_scaling()
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if stream:
        out["stream"] = stream
        out["turns_per_sec_sustained"] = stream["throughput_local32"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
