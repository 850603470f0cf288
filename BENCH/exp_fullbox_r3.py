"""Round-3 experiment: close the full-box (1x8 vs 4x8 executors)
scaling gap (r2: 0.772 vs the >=0.8 rule; hardware control 0.861).

Each variant runs the same interleaved 1x8 / 4x8 local-cluster pairs
as bench.py's _scaling_lc, with tuning confs injected via
SPARK_GRAFT_LC_CONFS / SPARK_GRAFT_ARROW_BATCH.
"""
import json
import os
import subprocess
import sys

REPO = "/root/repo"
CORPUS = f"{REPO}/synthdata/mixed_flat_sf0.1"
REPLICATE = "48"  # bench.py's fullbox target (960k docs)

VARIANTS = {
    "base": {},
    "arrow32k": {"SPARK_GRAFT_ARROW_BATCH": "32768"},
    "nolocality": {"SPARK_GRAFT_LC_CONFS": "spark.locality.wait=0s"},
    "arrow32k+noloc": {
        "SPARK_GRAFT_ARROW_BATCH": "32768",
        "SPARK_GRAFT_LC_CONFS": "spark.locality.wait=0s",
    },
}


def run(n_exec: int, env_extra: dict) -> dict:
    env = {**os.environ, **env_extra}
    proc = subprocess.run(
        [sys.executable, f"{REPO}/bench.py", "--lc-worker",
         str(n_exec), "8", CORPUS, REPLICATE],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    if not lines:  # one retry: local-cluster startup is flaky
        proc = subprocess.run(
            [sys.executable, f"{REPO}/bench.py", "--lc-worker",
             str(n_exec), "8", CORPUS, REPLICATE],
            capture_output=True, text=True, timeout=1800, env=env,
            cwd=REPO,
        )
        lines = [ln for ln in proc.stdout.strip().splitlines()
                 if ln.startswith("{")]
    if not lines:
        raise RuntimeError(proc.stderr[-1500:])
    return json.loads(lines[-1])


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    names = list(VARIANTS)
    best = {v: {} for v in names}
    for _ in range(rounds):
        for v in names:
            for n in (1, 4):
                r = run(n, VARIANTS[v])
                if n not in best[v] or r["sec"] < best[v][n]["sec"]:
                    best[v][n] = r
                print(v, n, "x8:", round(r["sec"], 2), "s", flush=True)
    for v in names:
        tp1 = best[v][1]["docs"] / best[v][1]["sec"]
        tp4 = best[v][4]["docs"] / best[v][4]["sec"]
        print(v, "eff:", round(tp4 / (4 * tp1), 3),
              "sec:", round(best[v][1]["sec"], 2), "/",
              round(best[v][4]["sec"], 2), flush=True)


if __name__ == "__main__":
    main()
