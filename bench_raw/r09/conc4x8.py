"""4 concurrent pinned local[8] builds (disjoint core octets) vs one
local[32] — the r6 concurrent-window method applied to the 8->32
question at 1.6M docs. Models 4 real 8-core nodes; the two windows
each load the whole machine so host throttling hits both arms alike."""
import json, subprocess, sys, time
from pathlib import Path

REPO = Path("/root/repo")
INP = "/tmp/scaling16/pages_1600000.parquet"
import glob, os
cand = glob.glob("/tmp/scaling16/*")
print("workdir:", cand, file=sys.stderr)
inp = [c for c in cand if "pages" in c or c.endswith(".parquet")]
INP = inp[0] if inp else INP

def build(cores: str, cpus: int, out: str):
    cmd = ["taskset", "-c", cores, sys.executable,
           str(REPO / "jobs" / "build_index_job.py"),
           "--input", INP, "--output", out,
           "--shards", "32", "--buckets", "16", "--cpus", str(cpus)]
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True)
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    r = json.loads(line)
    r["subprocess_wall"] = round(time.time() - t0, 1)
    return r

# window 1: 4 concurrent pinned local[8]
octets = ["0-7", "8-15", "16-23", "24-31"]
import concurrent.futures as cf
t0 = time.time()
with cf.ThreadPoolExecutor(4) as ex:
    futs = [ex.submit(build, oc, 8, f"/tmp/conc8_{i}")
            for i, oc in enumerate(octets)]
    nodes = [f.result() for f in futs]
w1 = time.time() - t0
agg = sum(n["docs_per_sec"] for n in nodes)

# window 2: one local[32]
single = build("0-31", 32, "/tmp/conc8_single32")

out = {
    "purpose": "4 CONCURRENT pinned local[8] builds on disjoint core "
               "octets vs ONE local[32], same 1.6M input — the r6 "
               "concurrent-window method for the 8->32 ratio",
    "input": INP,
    "nodes": nodes,
    "conc_window_wall": round(w1, 1),
    "aggregate_docs_per_sec": round(agg, 1),
    "single_local32_docs_per_sec": single["docs_per_sec"],
    "single_local32": single,
    "single_vs_aggregate": round(single["docs_per_sec"] / agg, 3),
}
print(json.dumps(out))
