"""Index-build scale proof (VERDICT r4 Next #4).

The reference's import-time scan materializes every decoded image in memory
and OOM'd at ~13.8 GB for 2,534 images — a documented failure mode
(reference ``fish_coco_annotator.py:166-172``: "uses 13.8GB memory for 2534
image files... needs 32G RAM to run 8500 images").  The index-scanner design
here claims "all dirtiness handled at index time, bounded memory": the scan
stores paths + parsed polygon/annotation metadata only; pixels are decoded
per batch by the Batcher's thread pool.

This harness PROVES that at the reference's failure scale instead of assuming
it: it synthesizes a multi-source tree at (or past) the 2,534-image OOM point
from the same generators as experiments/integration_tree.py, then in a FRESH
subprocess (so tree-build numpy buffers don't pollute the high-water mark)
builds all three split indexes and iterates real decoded batches, recording:

* index-build wall time and RSS delta,
* process peak RSS (VmHWM) after index build,
* steady-state RSS while streaming ``MEASURE_BATCHES`` decoded batches,
* decode throughput (img/s) through the Batcher thread pool.

Pass criterion (reported, not asserted): peak RSS stays hundreds of MB —
i.e. no ~5.4 GB/1,000-images growth — at >= 2,534 images.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/index_scale.py
Env:  WORKDIR (default /tmp/index_scale), N_COCO/N_MLTS_BATCHES/
      N_MLTS_PER_BATCH/N_SUIM/N_DF (default 1000/10/60/500/500 = 2600),
      MEASURE_BATCHES (default 150), BATCH (default 16).
Appends a JSON line per phase to experiments/index_scale.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "index_scale.jsonl")


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def _hwm_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def record(row: dict) -> None:
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def build_phase(workdir: str) -> None:
    sys.path.insert(0, os.path.join(HERE, ".."))
    from experiments.integration_tree import build_tree

    counts = dict(
        n_coco=int(os.environ.get("N_COCO", 1000)),
        n_mlts_batches=int(os.environ.get("N_MLTS_BATCHES", 10)),
        n_mlts_per_batch=int(os.environ.get("N_MLTS_PER_BATCH", 60)),
        n_suim=int(os.environ.get("N_SUIM", 500)),
        n_df=int(os.environ.get("N_DF", 500)),
    )
    t0 = time.perf_counter()
    written = build_tree(workdir, **counts)
    dt = time.perf_counter() - t0
    du = subprocess.run(["du", "-sm", os.path.join(workdir, "data")],
                        capture_output=True, text=True)
    tree_mb = int(du.stdout.split()[0]) if du.returncode == 0 else -1
    record({"phase": "build", "written": written, "total": sum(written.values()),
            "tree_mb": tree_mb, "build_s": round(dt, 1)})


def measure_phase(workdir: str) -> None:
    os.chdir(workdir)
    sys.path.insert(0, os.path.join(HERE, ".."))
    rss0 = _rss_mb()

    t0 = time.perf_counter()
    from ecologysemanticsegmentation_tpu.config import EnvConfig
    from ecologysemanticsegmentation_tpu.data import Batcher, get_split_datasets
    import_s = time.perf_counter() - t0

    cfg = EnvConfig.from_env()
    # Both type surfaces: the reference's default train set is composite-only
    # (fish_dataset.py:46 exact type match — suim/deepfish are type
    # "segmentation"), but the OOM claim covers the scan machinery, so the
    # FULL four-loader surface is what get_split_datasets indexes here.
    t0 = time.perf_counter()
    train, val, test = get_split_datasets(
        cfg, dataset_type=("segmentation/composite", "segmentation"))
    index_s = time.perf_counter() - t0
    n_total = len(train) + len(val) + len(test)
    rss_after_index, hwm_after_index = _rss_mb(), _hwm_mb()
    record({"phase": "index", "images_indexed": n_total,
            "train": len(train), "val": len(val), "test": len(test),
            "import_s": round(import_s, 1), "index_build_s": round(index_s, 1),
            "rss_before_mb": round(rss0, 1),
            "rss_after_index_mb": round(rss_after_index, 1),
            "peak_rss_after_index_mb": round(hwm_after_index, 1)})

    batch_size = int(os.environ.get("BATCH", 16))
    n_batches = int(os.environ.get("MEASURE_BATCHES", 150))
    batcher = Batcher(train, batch_size=batch_size, shuffle=True, seed=0)
    rss_samples, n_imgs = [], 0
    t0 = time.perf_counter()
    for i, batch in enumerate(batcher):
        n_imgs += batch["image"].shape[0]
        rss_samples.append(_rss_mb())
        if i + 1 >= n_batches:
            break
    dt = time.perf_counter() - t0
    record({"phase": "stream", "batches": len(rss_samples),
            "batch_size": batch_size, "img_per_s": round(n_imgs / dt, 1),
            "rss_stream_max_mb": round(max(rss_samples), 1),
            "rss_stream_last_mb": round(rss_samples[-1], 1),
            "peak_rss_final_mb": round(_hwm_mb(), 1),
            "ref_oom_point": "13.8 GB @ 2534 images (fish_coco_annotator.py:166-172)"})


def main() -> None:
    workdir = os.environ.get("WORKDIR", "/tmp/index_scale")
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        measure_phase(workdir)
        return
    os.makedirs(workdir, exist_ok=True)
    if not os.path.isdir(os.path.join(workdir, "data")):
        build_phase(workdir)
    else:
        print(f"tree exists at {workdir}/data — skipping build", flush=True)
    # Fresh subprocess: the index/stream memory numbers must not inherit the
    # tree builder's allocator high-water mark.
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.join(HERE, ".."), "/root/.axon_site"]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    subprocess.run([sys.executable, os.path.abspath(__file__), "--measure"],
                   env=env, check=True)


if __name__ == "__main__":
    main()
