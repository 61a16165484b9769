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
STREAM_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "4000"))
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


def _stage_starters():
    from spamscope_spark.streaming.pipeline import (
        start_enriched_query,
        start_join_query,
        start_session_query,
        start_window_query,
    )

    return [
        ("enriched", start_enriched_query),
        ("sessions", start_session_query),
        ("tool_pairs", start_join_query),
        ("window_rates", start_window_query),
    ]


def stream_worker(cpus: int, input_path: str, work_dir: str) -> dict:
    """Run the four streaming queries (enriched/sessions/join/windows)
    over the given input SEQUENTIALLY; return wall-clock + throughput.
    Runs in its own JVM.

    Measurement design — the point is the north rule's "same job at N
    and 4N executors" criterion, so everything except executor-thread
    count is held constant:
    - shuffle partitions FIXED (64) at every core count: identical
      physical plans and state-store layout; only the threads executing
      them vary — exactly what adding executors to a cluster does.
    - queries run one at a time, each getting the whole "cluster"
      (concurrent queries would make local[8] fully-subscribed on a
      32-core box and local[32] 4x oversubscribed, measuring contention,
      not scaling).
    - scan splitting forced (maxPartitionBytes=8m) so map-side
      enrichment has >= 4N input splits at both sizes.
    - a small warmup pass first, so the timed pass measures SUSTAINED
      throughput (what a long-running streaming job sees), not JVM/
      codegen/Python-worker cold start."""
    from spamscope_spark.datagen import generate_turns
    from spamscope_spark.streaming.metrics import MetricsListener
    from spamscope_spark.streaming.pipeline import PipelineConfig

    from spamscope_spark.config import build_session

    spark = build_session(
        app_name=f"bench-stream-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "64")),
        extra={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    listener = MetricsListener()
    spark.streams.addListener(listener)

    warm_in = os.path.join(work_dir, "warmup_in")
    generate_turns(spark, n_convs=64, turns_per_conv=16).coalesce(
        8
    ).write.mode("overwrite").parquet(warm_in)
    warm_cfg = PipelineConfig(
        input_path=warm_in, work_dir=os.path.join(work_dir, "warmup")
    )
    for _name, start in _stage_starters():
        q, _ = start(spark, warm_cfg)
        q.awaitTermination()

    n_turns = spark.read.parquet(input_path).count()
    cfg = PipelineConfig(input_path=input_path, work_dir=os.path.join(work_dir, "main"))
    stage_wall: dict[str, float] = {}
    t0 = time.time()
    for name, start in _stage_starters():
        s0 = time.time()
        q, _ = start(spark, cfg)
        q.awaitTermination()
        stage_wall[name] = round(time.time() - s0, 3)
    wall = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "turns": n_turns,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "stage_wall_sec": stage_wall,
        "query_metrics": listener.summary(),
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
