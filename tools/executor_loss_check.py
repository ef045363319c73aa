"""Executor-LOSS behavior under the lineage-truncating loops (r5 verdict #2).

SCALING §18 validated the multi-process claims on a live standalone
cluster but left one untested: what happens when a worker DIES mid-query.
Two loops lean on executor-held state:

  1. the connected-components loop (``dedup._truncate_lineage``):
     ``localCheckpoint`` blocks live ONLY on executors and the upstream
     lineage is gone — the documented contract is that a lost block
     fails the job;
  2. the binned-closest ladder's persisted df2 / remaining sets:
     ordinary ``persist`` KEEPS lineage, so a lost block must be
     recomputed transparently.

This script stands up a master + N workers in-container, runs each
workload while SIGKILLing one worker mid-flight, and pins the observed
behavior:

  A. CC loop with localCheckpoint + worker kill  -> expect either a
     CLEAN job failure (SparkException naming a lost checkpoint/shuffle
     block) or — if the kill lands between materializations — normal
     completion; the observed outcome is printed either way.
  B. CC loop with the documented one-line swap (checkpoint dir +
     spark.bioframe.reliableCheckpoint=true) + worker kill -> must
     COMPLETE with the same components as an unkilled run.
  C. binned closest (persist-based) + worker kill -> must COMPLETE
     (lineage recompute) with values identical to an unkilled run.

Run: python tools/executor_loss_check.py [sf_dir]
(starts/stops its own cluster; ~4 min)
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
N_WORKERS = 3

RESULTS: list[tuple[str, bool, str]] = []


def check(name: str, ok: bool, note: str = ""):
    RESULTS.append((name, bool(ok), note))
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {note}", flush=True)


def _spawn(cls: str, *args: str) -> subprocess.Popen:
    env = dict(os.environ)
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    return subprocess.Popen(
        [f"{SPARK_HOME}/bin/spark-class", cls, *args],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env)


def start_cluster() -> list[subprocess.Popen]:
    procs = [_spawn("org.apache.spark.deploy.master.Master",
                    "--host", "127.0.0.1", "--port", "7077",
                    "--webui-port", "8090")]
    time.sleep(5)
    for i in range(N_WORKERS):
        procs.append(_spawn(
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "--cores", "8", "--memory", "8g",
            "--webui-port", str(8190 + i)))
    time.sleep(8)
    return procs


def kill_one_worker(procs, delay: float):
    """SIGKILL the last worker `delay` seconds from now (no clean
    shutdown — the executor and its blocks vanish)."""
    victim = procs[-1]

    def _kill():
        time.sleep(delay)
        try:
            victim.send_signal(signal.SIGKILL)
            print(f"  >> worker pid {victim.pid} SIGKILLed", flush=True)
        except Exception as e:  # already dead
            print(f"  >> kill failed: {e}", flush=True)

    t = threading.Thread(target=_kill, daemon=True)
    t.start()
    return t


def big_pairs(spark, sf_dir: str, copies: int = 6):
    """A pair graph large enough that the CC loop runs multi-second:
    near-dup chains over replicated doc ids (chains of length `copies`
    per base id => component = base id)."""
    from functools import reduce

    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id").distinct()
    frames = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("id1"),
            (F.col("doc_id") + F.lit((i + 1) * 10_000_000)).alias("id2"))
        for i in range(copies)
    ]
    return reduce(lambda x, y: x.unionByName(y), frames)


def fresh_session(extra_conf: dict | None = None):
    """A NEW SparkSession against the standalone master (stopping any
    previous one — executor-loss state must not leak across scenarios)."""
    from pyspark.sql import SparkSession
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        time.sleep(2)
    os.environ["SPARK_GRAFT_MASTER"] = MASTER_URL
    os.environ.setdefault("SPARK_EXECUTOR_MEM", "6g")
    os.environ.setdefault("SPARK_EXECUTOR_CORES", "8")
    from bioframe_spark.session import get_spark
    spark = get_spark("executor-loss", shuffle_partitions=24)
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in (extra_conf or {}).items():
        spark.conf.set(k, v)
    # wait for executors to register
    spark.range(1000).repartition(20).count()
    return spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    procs = start_cluster()
    try:
        from pyspark.sql import functions as F

        from bioframe_spark.datapipe import dedup

        # ---- A0/B0: the RAW contract, deterministically --------------
        # localCheckpoint blocks live only on executors; materialize a
        # frame across all of them, kill a worker, then read it — the
        # lost blocks MUST be re-read (no task-retry absorption
        # possible), pinning the exact failure/recovery contract the
        # loops above inherit probabilistically.
        spark = fresh_session()
        lc = spark.range(0, 3_000_000).repartition(24) \
            .withColumn("h", F.xxhash64("id")).localCheckpoint(eager=True)
        assert lc.count() == 3_000_000
        kill_one_worker(procs, 0.5).join()
        time.sleep(4)
        try:
            n = lc.count()
            check("A0.read localCheckpoint after worker kill", False,
                  f"unexpectedly recovered ({n} rows) — contract changed?")
        except Exception as e:
            msg = str(e).replace("\n", " ")
            clean = any(s in msg for s in ("Checkpoint block", "block",
                                           "FetchFailed", "lost"))
            check("A0.localCheckpoint read fails CLEANLY after kill",
                  clean, msg[:160])
        procs.append(_spawn(
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "--cores", "8", "--memory", "8g", "--webui-port", "8390"))
        time.sleep(6)

        ckdir0 = tempfile.mkdtemp(prefix="raw_reliable_ck_")
        spark = fresh_session()
        spark.sparkContext.setCheckpointDir(ckdir0)
        rc = spark.range(0, 3_000_000).repartition(24) \
            .withColumn("h", F.xxhash64("id")).checkpoint(eager=True)
        assert rc.count() == 3_000_000
        kill_one_worker(procs, 0.5).join()
        time.sleep(4)
        try:
            n = rc.count()
            check("B0.read reliable checkpoint after worker kill", n == 3_000_000,
                  f"{n} rows")
        except Exception as e:
            check("B0.read reliable checkpoint after worker kill", False,
                  str(e).replace("\n", " ")[:160])
        procs.append(_spawn(
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "--cores", "8", "--memory", "8g", "--webui-port", "8391"))
        time.sleep(6)

        # ---- baseline (no kill): expected components ----------------
        spark = fresh_session()
        t0 = time.time()
        comp = dedup.connected_components(
            big_pairs(spark, sf_dir), strategy="loop")
        want = comp.agg(F.count(F.lit(1)).alias("n"),
                        F.max(F.xxhash64("id", "component")).alias("h")) \
            .collect()[0]
        base_wall = time.time() - t0
        print(f"baseline CC: {want['n']} rows in {base_wall:.1f}s",
              flush=True)
        kill_delay = max(base_wall * 0.4, 2.0)

        # ---- A: localCheckpoint + kill ------------------------------
        spark = fresh_session()
        kill_one_worker(procs, kill_delay)
        outcome, note = "completed", ""
        try:
            comp = dedup.connected_components(
                big_pairs(spark, sf_dir), strategy="loop")
            got = comp.agg(F.count(F.lit(1)).alias("n"),
                           F.max(F.xxhash64("id", "component")).alias("h")) \
                .collect()[0]
            note = (f"values {'match' if tuple(got) == tuple(want) else 'DIFFER'}"
                    f" ({got['n']} rows)")
            ok = tuple(got) == tuple(want)
        except Exception as e:
            outcome = "failed"
            msg = str(e).replace("\n", " ")[:200]
            # a CLEAN failure (clear block/fetch error, session usable) is
            # the documented contract
            lost = any(s in msg for s in
                       ("Checkpoint block", "FetchFailed", "lost",
                        "RDDBlockId", "ExecutorLostFailure", "block"))
            note = f"clean={lost}: {msg}"
            ok = lost
        check(f"A.localCheckpoint+kill -> {outcome}", ok, note)
        procs.append(_spawn(  # replace the dead worker for the next run
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "--cores", "8", "--memory", "8g", "--webui-port", "8490"))
        time.sleep(6)

        # ---- B: reliable checkpoint + kill --------------------------
        ckdir = tempfile.mkdtemp(prefix="cc_reliable_ck_")
        spark = fresh_session({"spark.bioframe.reliableCheckpoint": "true"})
        spark.sparkContext.setCheckpointDir(ckdir)
        kill_one_worker(procs, kill_delay)
        try:
            comp = dedup.connected_components(
                big_pairs(spark, sf_dir), strategy="loop")
            got = comp.agg(F.count(F.lit(1)).alias("n"),
                           F.max(F.xxhash64("id", "component")).alias("h")) \
                .collect()[0]
            check("B.reliableCheckpoint+kill -> completed",
                  tuple(got) == tuple(want),
                  f"values {'match' if tuple(got) == tuple(want) else 'DIFFER'}")
        except Exception as e:
            check("B.reliableCheckpoint+kill -> completed", False,
                  str(e).replace("\n", " ")[:200])
        procs.append(_spawn(
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "--cores", "8", "--memory", "8g", "--webui-port", "8590"))
        time.sleep(6)

        # ---- C: binned closest (persist-based ladder) + kill --------
        import __spark_entry__ as em
        import bioframe_spark as bf
        spark = fresh_session()
        p = em.ivals_p(spark, sf_dir)
        s = em.ivals_s(spark, sf_dir)
        ref = bf.closest(p, s, k=1, suffixes=("", "_s"), strategy="binned")
        want_c = ref.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
        spark = fresh_session()
        p = em.ivals_p(spark, sf_dir)
        s = em.ivals_s(spark, sf_dir)
        kill_one_worker(procs, 1.5)
        try:
            out = bf.closest(p, s, k=1, suffixes=("", "_s"),
                             strategy="binned")
            got_c = out.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
            check("C.closest(persist)+kill -> completed",
                  got_c == want_c, f"{got_c} vs {want_c} rows")
        except Exception as e:
            check("C.closest(persist)+kill -> completed", False,
                  str(e).replace("\n", " ")[:200])

        n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
        print(f"\n{len(RESULTS) - n_fail}/{len(RESULTS)} checks pass")
        sys.exit(1 if n_fail else 0)
    finally:
        for pr in procs:
            try:
                pr.terminate()
            except Exception:
                pass


if __name__ == "__main__":
    main()
