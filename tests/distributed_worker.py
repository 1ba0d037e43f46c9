"""Worker process for the real multi-process distributed test.

Launched by tests/test_distributed.py as 2 OS processes, each with 4 virtual
CPU devices: initializes jax.distributed, builds the SAME deterministic
global batch on every process, converts the process-local slice into a
global sharded array (host_local_array_to_global_array), runs ONE sharded
train step over the global 8-device mesh, and prints the loss.

This executes the code path of ``train.py --distributed``
(jax.distributed.initialize -> GSPMD train step with a cross-process
``data`` axis), which a single-process virtual mesh cannot exercise.
"""

import os
import sys


def main() -> None:
    coordinator = sys.argv[1]
    num_procs = int(sys.argv[2])
    pid = int(sys.argv[3])

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ctrl_sim_tpu.config import _set_dotted, load_config
    from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario
    from ctrl_sim_tpu.data.datagen import generate_offline_data
    from ctrl_sim_tpu.data.pipeline import build_train_batch
    from ctrl_sim_tpu.data.scenario import Scenario
    from ctrl_sim_tpu.models.ctrl_sim import CtRLSim, compute_loss
    from ctrl_sim_tpu.parallel.mesh import make_mesh
    from ctrl_sim_tpu.training.trainer import TrainState, make_optimizer

    small = {
        "model.hidden_dim": 32,
        "model.dim_feedforward": 64,
        "model.num_heads": 2,
        "model.num_decoder_layers": 1,
        "model.num_transformer_encoder_layers": 1,
        "model.dropout": 0.0,
        "model.compute_dtype": "float32",
        "waymo.train_context_length": 5,
        "waymo.max_num_agents": 4,
        "waymo.max_num_road_polylines": 8,
        "waymo.max_num_road_pts_per_polyline": 10,
        "sim.steps": 10,
        "sim.max_agents": 4,
        "train.accum_steps": 1,
    }
    cfg = load_config()
    for k, v in small.items():
        cfg = _set_dotted(cfg, k, v)

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == num_procs * n_local, (n_global, n_local)

    # identical deterministic global batch on every process
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=3, arena_half=60.0,
                           num_lanes=2, invalid_tail_agents=0)
        for s in range(n_global)
    ]
    sb = stack_scenarios(scenes, cfg)
    d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in dataclasses.asdict(sb).items()}
    d["name"] = ""
    sbj = Scenario(**d)
    offline = generate_offline_data(cfg, sbj)
    batch_j = build_train_batch(cfg, jax.random.PRNGKey(0), sbj, offline)
    batch = jax.tree.map(np.asarray, batch_j)

    mesh = make_mesh()  # global (data=8, model=1) mesh across both processes
    data_sharding = NamedSharding(mesh.mesh, P("data"))
    repl = NamedSharding(mesh.mesh, P())

    # process-local slice -> global sharded array
    lo, hi = pid * n_local, (pid + 1) * n_local
    gbatch = jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x[lo:hi], mesh.mesh, P("data")
        ),
        batch,
    )

    model = CtRLSim(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch_j, deterministic=True)
    tx = make_optimizer(cfg, params)
    state = TrainState(
        step=np.zeros((), np.int32), params=params, opt_state=tx.init(params)
    )
    # identical on all processes -> global fully-replicated arrays
    state = jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh.mesh, P()
        ),
        state,
    )

    def train_step(st, b):
        def loss_fn(p):
            preds = model.apply(p, b, deterministic=True)
            return compute_loss(cfg, b, preds).total

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        import optax

        new_params = optax.apply_updates(st.params, updates)
        return TrainState(step=st.step + 1, params=new_params, opt_state=new_opt), loss

    step = jax.jit(
        train_step, in_shardings=(repl, data_sharding), out_shardings=(repl, repl)
    )
    new_state, loss = step(state, gbatch)
    # fully-replicated global arrays: read the process-local shard
    loss_val = float(np.asarray(loss.addressable_data(0)))
    # also fingerprint the updated params to check cross-process agreement
    pnorm_arr = jax.jit(
        lambda s: jax.tree.reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))), s.params, 0.0
        ),
        out_shardings=repl,
    )(new_state)
    pnorm = float(np.asarray(pnorm_arr.addressable_data(0)))
    print(f"RESULT pid={pid} loss={loss_val:.10f} pnorm={pnorm:.6f}", flush=True)


if __name__ == "__main__":
    main()
