"""Weak-scaling of the sharded FLAGSHIP step on the virtual CPU mesh.

VERDICT r4 item 9: the ready-to-run artifact for a real multi-chip
slice. Runs the full 100-PRB MCS26 EVA estimated-CE round-0 step
(__graft_entry__.flagship_sharded_step) over meshes of 1/2/4/8 devices
with a FIXED per-device batch and measures steps/s.

CAVEAT (printed into the artifact): with
--xla_force_host_platform_device_count the "devices" share one host's
cores, so this validates the sharding MECHANICS and collective overhead
(the psum cost shows up as efficiency < 1), not hardware scaling — the
hardware weak-scaling number needs a real slice; the program is
unchanged between the two.

One subprocess per mesh size (the device count is fixed at backend
init). Writes scale_campaign.json.
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MESHES = (1, 2, 4, 8)
BATCH_PER_DEV = 2
N_REP = 6


def worker(n_dev: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import __graft_entry__ as g

    run = g.make_flagship_sharded(n_dev, batch_per_device=BATCH_PER_DEV)
    errs, miss, trials = run(0)            # compile + settle
    assert errs == 0 and miss == 0, (errs, miss)
    t0 = time.perf_counter()
    for i in range(N_REP):
        errs, miss, trials = run(i + 1)
    dt = (time.perf_counter() - t0) / N_REP
    print(json.dumps({"n_dev": n_dev, "trials": trials,
                      "step_seconds": dt,
                      "subframes_per_s": trials / dt}))


def main():
    if len(sys.argv) > 2 and sys.argv[2] == "--worker":
        worker(int(sys.argv[1]))
        return
    rows = []
    for n in MESHES:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={n}")
        r = subprocess.run([sys.executable, __file__, str(n), "--worker"],
                           capture_output=True, text=True, env=env)
        line = [ln for ln in r.stdout.strip().splitlines()
                if ln.startswith("{")]
        assert line, r.stdout + r.stderr
        row = json.loads(line[-1])
        rows.append(row)
        print(f"mesh {n}: {row['subframes_per_s']:.2f} sf/s "
              f"({row['trials']} trials / {row['step_seconds']:.2f} s)",
              flush=True)
    # On SHARED-CORE virtual devices the meaningful check is that the
    # host's TOTAL throughput stays flat as the mesh grows (the work per
    # device is constant, the cores are the same): any drop is pure
    # sharding/collective overhead. Per-device "efficiency" only means
    # something on real chips, where each device brings its own compute.
    total0 = rows[0]["subframes_per_s"]
    retained = [r["subframes_per_s"] / total0 for r in rows]
    out = {
        "config": "100 PRB MCS26 EVA estimated-CE round-0 step, "
                  f"{BATCH_PER_DEV}/device, shard_map over 'ue'",
        "caveat": "virtual CPU devices share one host's cores: the "
                  "throughput-retained metric isolates sharding + "
                  "collective overhead (1.0 = none); hardware weak "
                  "scaling needs a real slice — the program is "
                  "unchanged between the two",
        "rows": rows,
        "throughput_retained_vs_mesh1": {str(r["n_dev"]): round(e, 3)
                                         for r, e in zip(rows, retained)},
    }
    with open(os.path.join(ROOT, "scale_campaign.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote scale_campaign.json:",
          out["throughput_retained_vs_mesh1"])


if __name__ == "__main__":
    main()
