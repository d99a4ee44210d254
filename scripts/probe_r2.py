"""Round-2 perf probe: break down the fwd+bwd lattice time at the bench
shape (B=32, T=80, U=400) into kernel / posterior / transpose components."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ssnt_tts_tpu.ops import lattice, lattice_pallas, lattice_scan


def bench_chained(make_step, x0, iters=50, repeats=3):
    @jax.jit
    def run(x):
        def body(c, _):
            return make_step(c), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    jax.block_until_ready(run(x0))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


def main():
    B, T, U = 32, 80, 400
    rng = np.random.default_rng(0)
    le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (B, T, U))), jnp.float32)
    ls = jnp.log1p(-jnp.exp(le))
    lf = jnp.asarray(rng.normal(0, 0.5, (B, T, U)), jnp.float32)
    T_b = jnp.full((B,), T, jnp.int32)
    U_b = jnp.full((B,), U, jnp.int32)
    cells = B * T * U

    le_u = jnp.transpose(le, (2, 0, 1))
    ls_u = jnp.transpose(ls, (2, 0, 1))
    lf_u = jnp.transpose(lf, (2, 0, 1))

    def report(name, dt):
        print(f"{name:50s} {dt*1e6:9.1f} us   {cells/dt/1e6:9.1f} Mcells/s")

    # 1. transpose cost alone (3 arrays in, 3 out)
    def tr_step(x):
        o = jnp.transpose(x, (2, 0, 1))
        return jnp.transpose(o, (1, 2, 0)) * (1 + 1e-12)

    report("transpose (B,T,U)->(U,B,T)->back, 1 array", bench_chained(tr_step, le))

    # 2. fused bidir exp kernel alone (time-major inputs, no transposes)
    def bidir_step(x):
        a, b = lattice_pallas.fused_alphas_betas_pallas_exp(
            x, ls_u, lf_u, T_b, U_b, chunk=16
        )
        return x + a[0] * 1e-12

    report("fused bidir exp kernel (alpha+beta)", bench_chained(bidir_step, le_u))

    # 2b. log-domain fused bidir
    def bidir_log_step(x):
        a, b = lattice_pallas.fused_alphas_betas_pallas(
            x, ls_u, lf_u, T_b, U_b, chunk=16
        )
        return x + a[0] * 1e-12

    report("fused bidir log kernel", bench_chained(bidir_log_step, le_u))

    # 3. fwd-only kernel
    def fwd_step(x):
        a = lattice_pallas.forward_alphas_pallas(x, ls_u, lf_u, chunk=16)
        return x + a[0] * 1e-12

    report("fwd-only kernel", bench_chained(fwd_step, le_u))

    # 3b. bwd+grad fused kernel (the large-B path)
    alphas0 = lattice_pallas.forward_alphas_pallas(le_u, ls_u, lf_u, chunk=16)
    g = jnp.ones((B,), jnp.float32)
    logz = lattice._gather_logz(alphas0, le_u, T_b, U_b)

    def bwdgrad_step(x):
        d = lattice_pallas.backward_grads_pallas(
            x, ls_u, lf_u, alphas0, T_b, U_b, g, logz, chunk=16
        )
        return x + d[0][0] * 1e-12

    report("bwd+grad fused kernel", bench_chained(bwdgrad_step, le_u))

    # 4. XLA posterior pass alone (time-major in, (B,T,U) grads out)
    betas0 = lattice._backward_betas(le_u, ls_u, lf_u, T_b, U_b)

    def post_step(x):
        d_le, d_ls, d_lf = _posteriors(x, ls_u, lf_u, alphas0, betas0, logz,
                                       T_b, U_b, g)
        return x + jnp.transpose(d_le, (2, 0, 1)) * 1e-12

    def _posteriors(le, ls, lf, alphas, betas, logz, input_length,
                    output_length, g):
        U_, B_, T_ = le.shape
        u_idx = jnp.arange(U_)[:, None, None]
        t_idx = jnp.arange(T_)[None, None, :]
        in_len = input_length[None, :, None]
        out_len = output_length[None, :, None]
        valid = (t_idx < in_len) & (u_idx < out_len)
        is_last_u = u_idx == out_len - 1
        is_last_t = t_idx == in_len - 1
        lf_beta = lf + betas
        lf_beta_next_u = jnp.concatenate(
            [lf_beta[1:], jnp.full((1, B_, T_), lattice.NEG)], axis=0
        )
        cont_emit = jnp.where(
            is_last_u, jnp.where(is_last_t, 0.0, lattice.NEG), lf_beta_next_u
        )
        shifted = jnp.concatenate(
            [lf_beta_next_u[:, :, 1:], jnp.full((U_, B_, 1), lattice.NEG)],
            axis=2,
        )
        cont_shift = jnp.where(is_last_u, lattice.NEG, shifted)
        logz_b = logz[None, :, None]

        def post(score):
            s = jnp.minimum(score - logz_b, 30.0)
            return jnp.where(valid, jnp.exp(s), 0.0)

        gB = g[None, :, None]
        d_le = jnp.transpose(-post(alphas + le + cont_emit) * gB, (1, 2, 0))
        d_ls = jnp.transpose(-post(alphas + ls + cont_shift) * gB, (1, 2, 0))
        d_lf = jnp.transpose(-post(alphas + betas) * gB, (1, 2, 0))
        return d_le, d_ls, d_lf

    report("XLA posterior pass (+3 grad transposes)", bench_chained(post_step, le_u))

    # 5. full grad paths
    def grad_step_pallas(x):
        gr = jax.grad(
            lambda a: jnp.sum(
                lattice_pallas.ssnt_loss_pallas(a, ls, lf, T_b, U_b)
            )
        )(x)
        return x + gr * 1e-12

    report("FULL pallas grad (current bench path)", bench_chained(grad_step_pallas, le))

    def grad_step_scan(x):
        gr = jax.grad(
            lambda a: jnp.sum(
                lattice_scan.ssnt_loss_scan(a, ls, lf, T_b, U_b, K=16)
            )
        )(x)
        return x + gr * 1e-12

    report("FULL lattice_scan grad (K=16)", bench_chained(grad_step_scan, le))

    def fwd_loss_scan(x):
        out = lattice_scan.ssnt_loss_scan(x, ls, lf, T_b, U_b, K=16)
        return x + out[0] * 1e-12

    report("lattice_scan fwd loss (K=16)", bench_chained(fwd_loss_scan, le))


if __name__ == "__main__":
    main()
