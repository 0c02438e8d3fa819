"""FIXTURES.md F7 #5: identical pipeline output across parallelism levels.

Runs the full linkage pipeline in two subprocesses (local[8] vs local[32]),
fresh checkpoint dirs, and compares the sorted entity tables byte-for-byte.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_JOB = r'''
import os, sys, tempfile, hashlib
sys.path.insert(0, os.environ["REPO"])
from automatedreclin_spark.session import get_spark
from automatedreclin_spark.fixtures import synth_files
from automatedreclin_spark.pipeline import link_repo_files

spark = get_spark(app_name="determinism", cpus=int(os.environ["CPUS"]))
A, B, labels = synth_files(spark, n_a=400, n_b=800, seed=17)
ck = tempfile.mkdtemp(prefix="det_")
run = link_repo_files(spark, A, B, checkpoint_dir=ck, labels=labels)
ent = run.entities.orderBy("entity_id", "side", "id").toPandas()
digest = hashlib.sha256(ent.to_csv(index=False).encode()).hexdigest()
matches = run.matches.orderBy("a", "b").toPandas()
mdigest = hashlib.sha256(matches.to_csv(index=False).encode()).hexdigest()
print("DIGEST", digest, mdigest, len(ent), len(matches))
'''


def run_level(cpus: int) -> tuple[str, str, str, str]:
    env = dict(os.environ)
    env.update({"REPO": str(REPO), "CPUS": str(cpus)})
    out = subprocess.run([sys.executable, "-c", _JOB], env=env,
                         capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("DIGEST"):
            return tuple(line.split()[1:])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    lo = run_level(8)
    hi = run_level(32)
    same = lo == hi
    print(json.dumps({
        "local8": lo, "local32": hi, "identical": same,
    }, indent=2))
    if not same:
        sys.exit(1)


if __name__ == "__main__":
    main()
