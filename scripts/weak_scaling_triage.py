"""Root-cause triage of the weak-scaling partition efficiency (VERDICT r2
weak #3 / next-round #4).

partition_efficiency = t(unsharded, total batch B) / t(sharded over n, same
B) on virtual CPU devices. Round 2 measured 0.60-0.70 unexplained. The
discriminating experiments:

  A. TRAIN step sharded vs unsharded   (the round-2 number)
  B. FWD-ONLY loss sharded vs unsharded — has no gradient psum; if B is as
     bad as A, collectives are NOT the cause (partitioning/dispatch or
     thread contention is).
  C. bare ALL-REDUCE of a param-sized tree on the n-device mesh — a direct
     collective-time estimate to compare against the A-B gap.
  D. A at 4x the per-device batch — fixed per-step overhead amortizes away
     if it's dispatch; stays if it's bandwidth/contention.
  E. A on a data x model mesh (model=2) — does the model axis change it.

  python scripts/weak_scaling_triage.py --devices 8 --json WEAKSCALE_TRIAGE.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--per-device-batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--seq", type=int, nargs=2, default=[32, 80],
                   metavar=("T", "U"))
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ssnt_tts_tpu.models import SSNTModel
    from ssnt_tts_tpu.parallel import mesh as mesh_lib
    from ssnt_tts_tpu.parallel import train as train_lib
    from ssnt_tts_tpu.utils.config import (
        MeshConfig, TrainConfig, tiny_model_config,
    )
    import __graft_entry__ as g

    n = args.devices
    cfg = tiny_model_config()
    model = SSNTModel(cfg)
    T, U = args.seq
    record = {"devices": n, "seq": args.seq,
              "per_device_batch": args.per_device_batch, "experiments": {}}

    def bench(fn, *a):
        out = fn(*a)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.steps

    def make_state_and_batch(B, mesh):
        batch = g._example_batch(cfg, B, T, U)
        tcfg = TrainConfig(warmup_steps=2, batch_size=B)
        state = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, tcfg
        )
        tx = train_lib.make_optimizer(tcfg)
        host_state = jax.device_get(state)
        step_fn, sstate = train_lib.make_sharded_train_step(
            model, tx, mesh, jax.device_put(host_state)
        )
        sbatch = jax.device_put(batch, mesh_lib.data_sharding(mesh))
        return step_fn, sstate, sbatch, host_state, tx

    def train_dt(B, data, model_ax=1):
        # The step donates its state input, so time a self-feeding loop
        # (state flows through; first call doubles as the compile).
        mesh = mesh_lib.make_mesh(MeshConfig(data=data, model=model_ax))
        step_fn, sstate, sbatch, _, _ = make_state_and_batch(B, mesh)
        s, _ = step_fn(sstate, sbatch)  # compile
        jax.block_until_ready(s.params)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s, _ = step_fn(s, sbatch)
        jax.block_until_ready(s.params)
        return (time.perf_counter() - t0) / args.steps

    def fwd_dt(B, data):
        mesh = mesh_lib.make_mesh(MeshConfig(data=data, model=1))
        batch = g._example_batch(cfg, B, T, U)
        tcfg = TrainConfig(warmup_steps=2, batch_size=B)
        state = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, tcfg
        )
        params = jax.device_put(
            jax.device_get(state.params),
            mesh_lib.param_sharding(mesh, state.params),
        )
        sbatch = jax.device_put(batch, mesh_lib.data_sharding(mesh))

        @jax.jit
        def fwd(p, b):
            loss, _ = model.apply(
                p, b["tokens"], b["mel"], b["input_length"],
                b["output_length"], None, None, method=model.loss,
            )
            return loss

        return bench(fwd, params, sbatch)

    B = args.per_device_batch * n

    # A: train step
    dt_sh = train_dt(B, data=n)
    dt_un = train_dt(B, data=1)
    record["experiments"]["A_train"] = {
        "sharded_ms": round(dt_sh * 1e3, 2),
        "unsharded_ms": round(dt_un * 1e3, 2),
        "partition_efficiency": round(dt_un / dt_sh, 3),
    }
    print("A train:", record["experiments"]["A_train"], flush=True)

    # B: fwd-only (no grad psum)
    f_sh = fwd_dt(B, data=n)
    f_un = fwd_dt(B, data=1)
    record["experiments"]["B_fwd_only"] = {
        "sharded_ms": round(f_sh * 1e3, 2),
        "unsharded_ms": round(f_un * 1e3, 2),
        "partition_efficiency": round(f_un / f_sh, 3),
    }
    print("B fwd:", record["experiments"]["B_fwd_only"], flush=True)

    # C: bare all-reduce of a param-sized tree over the data axis.
    mesh = mesh_lib.make_mesh(MeshConfig(data=n, model=1))
    batch = g._example_batch(cfg, B, T, U)
    state = train_lib.init_train_state(
        model, jax.random.PRNGKey(0), batch,
        TrainConfig(warmup_steps=2, batch_size=B),
    )
    host_params = jax.device_get(state.params)
    nparams = sum(np.asarray(x).size for x in jax.tree.leaves(host_params))
    # Per-device grads: stack n copies on axis 0, shard axis 0 over data.
    from jax.sharding import NamedSharding, PartitionSpec as P

    stacked = jax.tree.map(
        lambda x: jax.device_put(
            np.broadcast_to(np.asarray(x)[None], (n,) + np.asarray(x).shape)
            .copy(),
            NamedSharding(mesh, P("data")),
        ),
        host_params,
    )

    @jax.jit
    def allreduce(tree):
        return jax.tree.map(lambda x: jnp.sum(x, axis=0), tree)

    dt_ar = bench(allreduce, stacked)
    record["experiments"]["C_allreduce"] = {
        "ms": round(dt_ar * 1e3, 3),
        "param_count": int(nparams),
    }
    print("C allreduce:", record["experiments"]["C_allreduce"], flush=True)

    # D: train at 4x per-device batch
    B4 = 4 * B
    dt_sh4 = train_dt(B4, data=n)
    dt_un4 = train_dt(B4, data=1)
    record["experiments"]["D_train_4x_batch"] = {
        "sharded_ms": round(dt_sh4 * 1e3, 2),
        "unsharded_ms": round(dt_un4 * 1e3, 2),
        "partition_efficiency": round(dt_un4 / dt_sh4, 3),
    }
    print("D 4x:", record["experiments"]["D_train_4x_batch"], flush=True)

    # E: data x model mesh
    dt_dm = train_dt(B, data=n // 2, model_ax=2)
    record["experiments"]["E_data_x_model"] = {
        "sharded_ms": round(dt_dm * 1e3, 2),
        "partition_efficiency_vs_unsharded": round(dt_un / dt_dm, 3),
    }
    print("E dxm:", record["experiments"]["E_data_x_model"], flush=True)

    # F: grad-only (value_and_grad + the gradient psum, NO optimizer).
    def grad_dt(B, data):
        mesh = mesh_lib.make_mesh(MeshConfig(data=data, model=1))
        batch = g._example_batch(cfg, B, T, U)
        tcfg = TrainConfig(warmup_steps=2, batch_size=B)
        st = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, tcfg
        )
        params = jax.device_put(
            jax.device_get(st.params),
            mesh_lib.param_sharding(mesh, st.params),
        )
        sbatch = jax.device_put(batch, mesh_lib.data_sharding(mesh))

        @jax.jit
        def gradfn(p, b):
            def loss_fn(pp):
                loss, _ = model.apply(
                    pp, b["tokens"], b["mel"], b["input_length"],
                    b["output_length"], None, None, method=model.loss,
                )
                return loss

            return jax.grad(loss_fn)(p)

        return bench(gradfn, params, sbatch)

    g_sh = grad_dt(B, data=n)
    g_un = grad_dt(B, data=1)
    record["experiments"]["F_grad_only"] = {
        "sharded_ms": round(g_sh * 1e3, 2),
        "unsharded_ms": round(g_un * 1e3, 2),
        "partition_efficiency": round(g_un / g_sh, 3),
    }
    print("F grad:", record["experiments"]["F_grad_only"], flush=True)

    # G: optimizer-only (clip_by_global_norm + adamw on REPLICATED params:
    # every device recomputes it redundantly — free on real chips, an n-fold
    # load on shared-core virtual devices).
    def opt_dt(data):
        mesh = mesh_lib.make_mesh(MeshConfig(data=data, model=1))
        batch = g._example_batch(cfg, args.per_device_batch, T, U)
        tcfg = TrainConfig(warmup_steps=2, batch_size=args.per_device_batch)
        st = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, tcfg
        )
        tx = train_lib.make_optimizer(tcfg)
        rep = mesh_lib.replicated(mesh)
        params = jax.device_put(jax.device_get(st.params), rep)
        opt_state = jax.device_put(jax.device_get(st.opt_state), rep)
        grads = jax.tree.map(lambda x: x * 0 + 1e-3, params)

        @jax.jit
        def upd(gr, os_, pp):
            import optax as _optax

            updates, new_os = tx.update(gr, os_, pp)
            return _optax.apply_updates(pp, updates)

        return bench(upd, grads, opt_state, params)

    o_sh = opt_dt(n)
    o_un = opt_dt(1)
    record["experiments"]["G_optimizer_only"] = {
        "replicated_on_n_ms": round(o_sh * 1e3, 2),
        "single_device_ms": round(o_un * 1e3, 2),
        "slowdown": round(o_sh / o_un, 2),
    }
    print("G opt:", record["experiments"]["G_optimizer_only"], flush=True)

    # H: lattice-DP-only grad (raw (U,B,T) inputs, no model) — isolates the
    # alpha/beta lax.scans whose per-iteration work shrinks with per-device
    # batch while per-iteration dispatch overhead does not.
    from ssnt_tts_tpu.ops import lattice as lattice_ops

    def lattice_dt(B, data):
        mesh = mesh_lib.make_mesh(MeshConfig(data=data, model=1))
        rngn = np.random.default_rng(0)
        le = jnp.asarray(
            np.log(rngn.uniform(0.1, 0.9, (U, B, T))), jnp.float32
        )
        ls = jnp.log1p(-jnp.exp(le))
        lf = jnp.asarray(rngn.normal(0, 0.5, (U, B, T)), jnp.float32)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(None, "data", None))
        le, ls, lf = (jax.device_put(x, sh) for x in (le, ls, lf))

        @jax.jit
        def gradfn(a, b, c):
            return jax.grad(
                lambda x, y, z: jnp.sum(
                    lattice_ops.ssnt_loss(x, y, z, layout="ubt")
                ),
                argnums=(0, 1, 2),
            )(a, b, c)

        return bench(gradfn, le, ls, lf)

    h_sh = lattice_dt(B, data=n)
    h_un = lattice_dt(B, data=1)
    record["experiments"]["H_lattice_grad_only"] = {
        "sharded_ms": round(h_sh * 1e3, 2),
        "unsharded_ms": round(h_un * 1e3, 2),
        "partition_efficiency": round(h_un / h_sh, 3),
    }
    print("H lattice:", record["experiments"]["H_lattice_grad_only"],
          flush=True)

    # I: model-only grad (surrogate sum loss over the lattice quantities —
    # matmuls + GRU scan, NO lattice DP scans).
    def model_grad_dt(B, data):
        mesh = mesh_lib.make_mesh(MeshConfig(data=data, model=1))
        batch = g._example_batch(cfg, B, T, U)
        tcfg = TrainConfig(warmup_steps=2, batch_size=B)
        st = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, tcfg
        )
        params = jax.device_put(
            jax.device_get(st.params),
            mesh_lib.param_sharding(mesh, st.params),
        )
        sbatch = jax.device_put(batch, mesh_lib.data_sharding(mesh))

        @jax.jit
        def gradfn(p, b):
            def loss_fn(pp):
                def quantities(tokens, mel, il):
                    enc = model.apply(pp, tokens, il, method=model.encode)
                    dec = model.apply(
                        pp, mel, method=model.decoder_states
                    )
                    le, ls, lf = model.apply(
                        pp, enc, dec, mel, method=model.lattice_quantities
                    )
                    return le, ls, lf

                le, ls, lf = quantities(
                    b["tokens"], b["mel"], b["input_length"]
                )
                return jnp.sum(le) + jnp.sum(ls) + jnp.sum(lf)

            return jax.grad(loss_fn)(p)

        return bench(gradfn, params, sbatch)

    i_sh = model_grad_dt(B, data=n)
    i_un = model_grad_dt(B, data=1)
    record["experiments"]["I_model_grad_no_lattice"] = {
        "sharded_ms": round(i_sh * 1e3, 2),
        "unsharded_ms": round(i_un * 1e3, 2),
        "partition_efficiency": round(i_un / i_sh, 3),
    }
    print("I model:", record["experiments"]["I_model_grad_no_lattice"],
          flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(record, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
