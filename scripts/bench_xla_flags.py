"""XLA compiler-flag sweep for the ResNet-50 headline (BASELINE cfg 2).

The step is HBM-bandwidth-bound at ~80% of the roofline
(docs/benchmarks.md); the remaining lever at the XLA level is fusion
depth/scheduling, steered by flags. Flags change the executable, so each
variant runs in a SUBPROCESS with its own XLA_FLAGS (and its own
compilation-cache key). Appends JSON lines to scripts/bench_xla_flags.log.

Run: ``python scripts/bench_xla_flags.py``
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

VARIANTS = {
    "baseline": "",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
}

CHILD = r"""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")
from ics_tpu.runtime.benchmark import bench_engine
from ics_tpu.runtime.engine import InferenceEngine
engine = InferenceEngine("resnet50", precision="bf16", buckets=(128,), canvas=256)
r = bench_engine(engine, batch=128, canvas=256, iters=30)
print("RESULT " + json.dumps(r))
"""


def main() -> None:
    with open("scripts/bench_xla_flags.log", "a") as log:
        for name, flags in VARIANTS.items():
            env = dict(os.environ)
            env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
            base = env.get("XLA_FLAGS", "")
            env["XLA_FLAGS"] = (base + " " + flags).strip()
            proc = subprocess.run(
                [sys.executable, "-c", CHILD], env=env,
                capture_output=True, text=True, timeout=1800,
            )
            result = None
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    result = json.loads(line[len("RESULT "):])
            rec = {"variant": name, "flags": flags, "rc": proc.returncode,
                   **(result or {})}
            if result is None:
                rec["stderr_tail"] = proc.stderr[-500:]
            line = json.dumps(rec)
            print(line, flush=True)
            log.write(line + "\n")


if __name__ == "__main__":
    main()
