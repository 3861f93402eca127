# On-chip probe: do CONCURRENT invocations from separate processes
# overlap on the tunneled TPU? The per-invocation fixed cost dominates
# wall time (ablate_inplace: marginal attempt cost ~0); if that cost is
# tunnel/server-side serialization rather than device occupancy, K
# concurrent processes each integrating B members could approach K x
# the single-process throughput at the same accuracy.
# Usage: python scripts/concurrent_probe.py [K] [B]  (f32 leg config)
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 2
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def child():
    os.environ.setdefault("RMT_TPU_X64", "0")
    import numpy as np
    import jax.numpy as jnp
    from dme_case import make_model_input
    from rmt_tpu.parallel import run_n2_ensemble_lockstep

    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}

    def run():
        ys, _ = run_n2_ensemble_lockstep(
            mi, sweep, rtol=1e-5, atol=1e-7, max_steps=768,
            newton_iters=5, j_every=8)
        np.asarray(ys[-1, 0, 0])

    run()  # compile
    t0 = time.perf_counter()
    run()
    print(f"child pid={os.getpid()} run {time.perf_counter()-t0:.2f}s",
          flush=True)


def main():
    if os.environ.get("CONC_CHILD"):
        child()
        return
    # sequential reference: one child, two timed runs
    env = dict(os.environ, CONC_CHILD="1")
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, capture_output=True, text=True, timeout=1200)
    print(f"1 process: {time.perf_counter()-t0:.1f}s wall (incl compile)\n"
          f"{p.stdout.strip()}", flush=True)
    # K concurrent children
    t0 = time.perf_counter()
    procs = [subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                              env=env, stdout=subprocess.PIPE, text=True)
             for _ in range(K)]
    outs = [q.communicate(timeout=1200)[0] for q in procs]
    wall = time.perf_counter() - t0
    print(f"{K} concurrent: {wall:.1f}s wall (incl compiles)", flush=True)
    for o in outs:
        print(o.strip(), flush=True)


if __name__ == "__main__":
    main()
