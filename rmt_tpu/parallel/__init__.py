from .ensemble import (
    batch_params,
    make_mesh,
    make_n1_ensemble,
    make_n2_ensemble,
    run_m10_sweep,
    run_m11_sweep,
    run_m12_sweep,
    run_m13_sweep,
    run_m14_sweep,
    run_n2_ensemble,
    run_n2_ensemble_lockstep,
    shard_batch,
)
