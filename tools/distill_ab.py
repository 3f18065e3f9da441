"""A/B harness: progressive distillation on a TRAINED tiny DDPM.

Answers the question the analytic oracle (tests/test_distill.py) cannot:
on a model trained by gradient descent (not an exact-capacity student),
does the distilled few-step student reproduce the teacher's many-step
trajectory better than the teacher's OWN few-step grid — and how do the
two student heads (v_prediction vs epsilon) compare under a fixed,
small training budget?

Protocol (all CPU-friendly; ~4 min at the defaults):
  1. train a tiny_scratch_unet ε-DDPM on synthetic soft-blob images
     (random center + color in [-1,1], the polyp-corpus stand-in);
  2. reference = teacher's 16-step trailing DDIM from a fixed key;
  3. baseline = teacher's own 4-step trailing DDIM, same key;
  4. distill 16 → 4 with each student head, same data/budget;
  5. report rel RMSE of each 4-step run against the 16-step reference.

Measured findings recorded in BASELINE.md (round 3, distillation
section): the ε-student's phases converge ~300× lower than the
v-student's under the same budget, because its warm start is exact while
the ε→v head switch is a large functional move that `--reparam_steps`
must fully close before phase 0 starts from a sane init.

Usage:
  python tools/distill_ab.py [--train_steps 600] [--steps_per_phase 200]
  python tools/distill_ab.py --sd   # SD-shaped conditional A/B (below)

`--sd` runs the same protocol on the SD *shape* of the problem: a
tiny-but-SD conditional UNet (cross-attention, 4-channel latent space —
models.tiny_condition_unet) trained with CFG-style conditioning dropout
on a fabricated textured-lesion latent corpus (class-dependent spatial
frequency + eccentric soft masks — structured enough that the guided
trajectory actually curves, unlike the blobs), then distilled 16 → 4
WITH guidance folding (teacher runs CFG at 2× batch, student is
cond-only at 1×) under the SHIPPED DEFAULTS (`epsilon` head,
auto-scaled reparam). The claim under test: default settings beat the
teacher's own 4-step grid on the teacher's 16-step CFG reference.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from polyp_tpu.diffusion.samplers import ddim_sample
from polyp_tpu.diffusion.schedule import DiffusionSchedule
from polyp_tpu.models.unet2d import tiny_scratch_unet
from polyp_tpu.train.distill import distill_progressive

T, SIZE = 512, 16


def make_data(n: int, k: jax.Array) -> jax.Array:
    """Soft blobs: random center in the interior, random RGB, bg = -1."""
    ks = jax.random.split(k, 3)
    cx = jax.random.uniform(ks[0], (n, 1, 1, 1), minval=4.0, maxval=12.0)
    cy = jax.random.uniform(ks[1], (n, 1, 1, 1), minval=4.0, maxval=12.0)
    col = jax.random.uniform(ks[2], (n, 1, 1, 3), minval=-1, maxval=1)
    yy, xx = jnp.mgrid[0:SIZE, 0:SIZE]
    d2 = ((xx[None, :, :, None] - cx) ** 2
          + (yy[None, :, :, None] - cy) ** 2)
    blob = jnp.exp(-d2 / 8.0)
    return (blob * col - (1 - blob)).astype(jnp.float32)


def make_latent_corpus(n: int, k: jax.Array, size: int = 8) -> jax.Array:
    """Fabricated textured-lesion latents (the SD-mode corpus): an
    eccentric soft mask times a banded texture whose spatial frequency is
    the class signal, plus a structured background — 4 channels, [-1, 1]-ish
    scale like VAE latents. High-frequency content makes the guided DDIM
    trajectory curve, so few-step grids genuinely lose accuracy (unlike
    smooth blobs, where the teacher's own 4-step grid is already close)."""
    ks = jax.random.split(k, 6)
    cx = jax.random.uniform(ks[0], (n, 1, 1, 1), minval=2.0, maxval=size - 2)
    cy = jax.random.uniform(ks[1], (n, 1, 1, 1), minval=2.0, maxval=size - 2)
    ecc = jax.random.uniform(ks[2], (n, 1, 1, 1), minval=0.5, maxval=2.0)
    freq = jax.random.uniform(ks[3], (n, 1, 1, 1), minval=1.5, maxval=3.5)
    phase = jax.random.uniform(ks[4], (n, 1, 1, 1), maxval=2 * np.pi)
    amp = jax.random.uniform(ks[5], (n, 1, 1, 4), minval=0.5, maxval=1.0)
    yy, xx = jnp.mgrid[0:size, 0:size]
    xx = xx[None, :, :, None].astype(jnp.float32)
    yy = yy[None, :, :, None].astype(jnp.float32)
    d2 = ecc * (xx - cx) ** 2 + (yy - cy) ** 2 / ecc
    mask = jnp.exp(-d2 / 6.0)
    tex = jnp.sin(freq * xx + phase) * jnp.cos(freq * yy - phase)
    bg = 0.3 * jnp.sin(0.7 * xx) * jnp.sin(0.9 * yy)
    return (amp * (mask * tex + (1 - mask) * bg)).astype(jnp.float32)


def run_sd_mode(args) -> None:
    """SD-shaped conditional A/B with guidance folding (module docstring)."""
    from polyp_tpu.diffusion.samplers import with_cfg
    from polyp_tpu.models import tiny_condition_unet

    t0 = time.time()
    T_, size, ctx_dim, gs = 512, 8, 32, 4.0
    sched = DiffusionSchedule.create(T_, "scaled_linear", 0.00085, 0.012)
    model = tiny_condition_unet()
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k}, jnp.zeros((1, size, size, 4)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 16, ctx_dim)))["params"]
    data = make_latent_corpus(256, jax.random.PRNGKey(3), size)
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 16, ctx_dim)) * 0.4
    uncond = jnp.zeros((1, 16, ctx_dim))

    def apply_fn(prm, x, t, ctx):
        return model.apply({"params": prm}, x, t, ctx)

    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(prm, opt, x0, key):
        kn, kt, kd = jax.random.split(key, 3)
        n = x0.shape[0]
        t = jax.random.randint(kt, (n,), 0, T_)
        noise = jax.random.normal(kn, x0.shape)
        x_t = sched.add_noise(x0, noise, t)
        # CFG-style conditioning dropout: 20% of samples see the uncond
        # embedding, so the guided teacher has a real uncond branch
        drop = jax.random.bernoulli(kd, 0.2, (n, 1, 1))
        ctx = jnp.where(drop, jnp.broadcast_to(uncond, (n,) + uncond.shape[-2:]),
                        jnp.broadcast_to(cond, (n,) + cond.shape[-2:]))

        def loss_fn(prm):
            return jnp.mean((apply_fn(prm, x_t, t, ctx) - noise) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(prm)
        up, opt2 = tx.update(g, opt, prm)
        return optax.apply_updates(prm, up), opt2, loss

    for i in range(args.train_steps):
        b = data[(i * 16) % 256:(i * 16) % 256 + 16]
        params, opt, loss = train_step(params, opt, b,
                                       jax.random.PRNGKey(100 + i))
    print(f"conditional teacher trained: final loss {float(loss):.4f} "
          f"({time.time() - t0:.0f}s)")

    skey = jax.random.PRNGKey(77)
    shape = (16, size, size, 4)
    guided = with_cfg(lambda x, t, e: apply_fn(params, x, t, e),
                      cond, uncond, gs)
    ref16 = ddim_sample(guided, sched, shape, skey, 16,
                        spacing="trailing", steps_offset=0)
    raw4 = ddim_sample(guided, sched, shape, skey, 4,
                       spacing="trailing", steps_offset=0)

    def rel(a):
        return float(jnp.sqrt(jnp.mean((a - ref16) ** 2))
                     / jnp.sqrt(jnp.mean(ref16 ** 2)))

    def batches():
        return [data[i:i + 16] for i in range(0, 256, 16)]

    v_sched = DiffusionSchedule.create(T_, "scaled_linear", 0.00085, 0.012,
                                       prediction_type="v_prediction")
    print(f"teacher-4step  vs teacher-16step rel RMSE: {rel(raw4):.4f} "
          f"(CFG {gs}, 2x batch)")
    for head, reparam in (("epsilon", -1), ("v_prediction", -1)):
        label = head + (" (SHIPPED DEFAULTS)" if head == "epsilon" else "")
        try:
            result = distill_progressive(
                apply_fn, params, sched, batches, start_steps=16,
                end_steps=4, steps_per_phase=args.steps_per_phase,
                learning_rate=args.learning_rate, weight_decay=0.0,
                student_prediction_type=head, reparam_steps=reparam,
                guidance_scale=gs, cond=cond, uncond=uncond)
        except RuntimeError as e:  # reparam guard: a reported result
            print(f"{label:34s}: REFUSED by the convergence guard: "
                  f"{str(e)[:120]}")
            continue
        s_sched = v_sched if head == "v_prediction" else sched

        def student_fn(x, t, _p=result.params):
            n = x.shape[0]
            return apply_fn(_p, x, t,
                            jnp.broadcast_to(cond, (n,) + cond.shape[-2:]))

        got4 = ddim_sample(student_fn, s_sched, shape, skey, 4,
                           spacing="trailing", steps_offset=0)
        phases = [(ph.num_steps, round(float(np.mean(ph.losses[-10:])), 5))
                  for ph in result.phases]
        print(f"{label:34s}-4step (folded, 1x batch) vs teacher-16step "
              f"rel RMSE: {rel(got4):.4f}  (phase losses {phases})")
    print(f"total {time.time() - t0:.0f}s")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_steps", type=int, default=600)
    p.add_argument("--steps_per_phase", type=int, default=200)
    p.add_argument("--reparam_steps", type=int, default=None,
                   help="default: steps_per_phase // 2")
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--sd", action="store_true",
                   help="SD-shaped conditional A/B with guidance folding "
                        "(module docstring)")
    args = p.parse_args(argv)
    if args.sd:
        return run_sd_mode(args)
    reparam = (args.steps_per_phase // 2 if args.reparam_steps is None
               else args.reparam_steps)

    t0 = time.time()
    sched = DiffusionSchedule.create(T, "scaled_linear", 0.00085, 0.012)
    model = tiny_scratch_unet()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,), jnp.int32))["params"]
    data = make_data(256, jax.random.PRNGKey(3))

    def apply_fn(prm, x, t, ctx=None):
        del ctx
        return model.apply({"params": prm}, x, t)

    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(prm, opt, x0, k):
        kn, kt = jax.random.split(k)
        t = jax.random.randint(kt, (x0.shape[0],), 0, T)
        noise = jax.random.normal(kn, x0.shape)
        x_t = sched.add_noise(x0, noise, t)

        def loss_fn(prm):
            return jnp.mean((apply_fn(prm, x_t, t) - noise) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(prm)
        up, opt2 = tx.update(g, opt, prm)
        return optax.apply_updates(prm, up), opt2, loss

    for i in range(args.train_steps):
        b = data[(i * 16) % 256:(i * 16) % 256 + 16]
        params, opt, loss = train_step(params, opt, b,
                                       jax.random.PRNGKey(100 + i))
    print(f"teacher trained: final loss {float(loss):.4f} "
          f"({time.time() - t0:.0f}s)")

    skey = jax.random.PRNGKey(77)
    shape = (16, SIZE, SIZE, 3)

    def teacher_fn(x, t):
        return apply_fn(params, x, t)

    ref16 = ddim_sample(teacher_fn, sched, shape, skey, 16,
                        spacing="trailing", steps_offset=0)
    raw4 = ddim_sample(teacher_fn, sched, shape, skey, 4,
                       spacing="trailing", steps_offset=0)

    def rel(a):
        return float(jnp.sqrt(jnp.mean((a - ref16) ** 2))
                     / jnp.sqrt(jnp.mean(ref16 ** 2)))

    def batches():
        return [data[i:i + 16] for i in range(0, 256, 16)]

    v_sched = DiffusionSchedule.create(T, "scaled_linear", 0.00085, 0.012,
                                       prediction_type="v_prediction")
    print(f"teacher-4step  vs teacher-16step rel RMSE: {rel(raw4):.4f}")
    for head in ("epsilon", "v_prediction"):
        result = distill_progressive(
            apply_fn, params, sched, batches, start_steps=16, end_steps=4,
            steps_per_phase=args.steps_per_phase,
            learning_rate=args.learning_rate, weight_decay=0.0,
            student_prediction_type=head, reparam_steps=reparam)
        s_sched = v_sched if head == "v_prediction" else sched

        def student_fn(x, t, _p=result.params):
            return apply_fn(_p, x, t)

        got4 = ddim_sample(student_fn, s_sched, shape, skey, 4,
                           spacing="trailing", steps_offset=0)
        phases = [(ph.num_steps, round(float(np.mean(ph.losses[-10:])), 5))
                  for ph in result.phases]
        print(f"{head:13s}-4step vs teacher-16step rel RMSE: "
              f"{rel(got4):.4f}  (phase losses {phases})")
    print(f"total {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
