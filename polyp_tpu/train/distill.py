"""Progressive distillation: halve the sampling-step count, repeatedly.

The reference has no analogue — this is the framework's TPU-first answer to
the measured sampling roofline (BASELINE.md round 3): the bf16 sampler runs
at 97% of its compute/memory ceiling, so further throughput must REMOVE
work, and the model's work is `num_steps × UNet`. Progressive distillation
(Salimans & Ho, "Progressive Distillation for Fast Sampling of Diffusion
Models", ICLR 2022) trains a student to match TWO deterministic DDIM steps
of its teacher in ONE step; each phase halves `num_steps` at (near) equal
sample quality, and phases compose: 64 → 32 → … → 4.

Design notes (all jit-compatible, mesh-shardable like the other trainers):

* **Nested trailing grids.** Student steps live on
  `inference_timesteps(T, N, "trailing")`; the teacher's two substeps use
  the 2N trailing grid, whose odd elements are exactly the midpoints and
  whose even elements ARE the student grid (requires `T % 2N == 0`).
  Unlike the `leading` spacing, this nests at EVERY phase including the
  final step (mid = T/2N − 1, endpoint ᾱ = alphas_cumprod[0]) — no
  special-casing anywhere in the math. Distilled models are therefore
  sampled with `ddim_sample(..., spacing="trailing", steps_offset=0)`.
* **Closed-form x̃₀ target.** For a student step t → t′ the unique x̃₀
  whose single DDIM transition reproduces the teacher's two-step result
  x″ is  x̃₀ = (x″ − (σ′/σ_t)·x_t) / (α′ − (σ′/σ_t)·α_t)   (paper §3).
  The denominator is bounded away from 0 because ᾱ increases along the
  transition.
* **v-prediction students.** One-step-from-noise x₀ recovery through an
  ε-head divides by α_t ≈ 0 at t ≈ T — the paper's reason to switch the
  student to v (or x₀) parameterization. When `student_prediction_type`
  differs from the teacher's, a REPARAM warmup first trains the student
  head to reproduce the teacher's own x̂₀ at the same t (0-substep
  distillation), giving the phase a sane init from teacher weights.
  `reparam_steps=-1` auto-scales the warmup to `steps_per_phase`, and
  `check_reparam_converged` fails loudly when the warmup loss has not
  plateaued — the measured failure mode (BASELINE.md round 3) is an
  under-trained head switch compounding through every phase. The CLIs
  default to "epsilon" (exact warm start) for short budgets.
* **Truncated-SNR loss.** L = E[max(SNR(t), 1) · ‖x̂₀ − x̃₀‖²] (paper's
  recommended weighting), computed in f32.
* **CFG folding.** `teacher_fn` is an arbitrary closure (x, t) → model_out:
  the SD path passes a `with_cfg`-wrapped teacher while the student sees
  the conditional branch only, folding the 2× guidance batch into the
  distilled model (Meng et al., "On Distillation of Guided Diffusion
  Models", CVPR 2023) — each halving phase then saves the CFG doubling on
  top of the step count.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from functools import partial

from polyp_tpu.diffusion.schedule import DiffusionSchedule, inference_timesteps

ModelApply = Callable[..., jax.Array]


# ---------------------------------------------------------------------------
# Grids
# ---------------------------------------------------------------------------

@struct.dataclass
class DistillGrid:
    """Per-student-step timestep tables for one halving phase (all [N])."""

    ts: jax.Array         # student eval timesteps (descending, trailing)
    ts_mid: jax.Array     # teacher midpoint timesteps
    abar_t: jax.Array     # ᾱ at ts
    abar_mid: jax.Array   # ᾱ at ts_mid
    abar_next: jax.Array  # ᾱ at the transition target (endpoint: ᾱ₀)
    num_steps: int = struct.field(pytree_node=False, default=0)


def distill_grid(schedule: DiffusionSchedule, num_student_steps: int,
                 final_alpha_to_one: bool = False) -> DistillGrid:
    """Build the nested trailing grids for one phase (see module docstring).

    Raises if `T % (2·N) != 0` — exact nesting (student grid == even
    elements of the teacher grid) only holds under divisibility, and an
    off-by-one here silently distills onto the wrong trajectory."""
    T, N = schedule.num_train_timesteps, num_student_steps
    if N < 1 or T % (2 * N) != 0:
        raise ValueError(
            f"progressive distillation needs T % (2*N) == 0 for nested "
            f"trailing grids; got T={T}, N={N}")
    ts_s = np.asarray(inference_timesteps(T, N, "trailing"))
    ts_2 = np.asarray(inference_timesteps(T, 2 * N, "trailing"))
    assert (ts_2[0::2] == ts_s).all(), "trailing grids failed to nest"
    ts_mid = ts_2[1::2]
    abar = np.asarray(schedule.alphas_cumprod)
    final_abar = 1.0 if final_alpha_to_one else float(abar[0])
    abar_next = np.concatenate([abar[ts_s[1:]], [final_abar]])
    return DistillGrid(ts=jnp.asarray(ts_s), ts_mid=jnp.asarray(ts_mid),
                       abar_t=jnp.asarray(abar[ts_s], jnp.float32),
                       abar_mid=jnp.asarray(abar[ts_mid], jnp.float32),
                       abar_next=jnp.asarray(abar_next, jnp.float32),
                       num_steps=N)


# ---------------------------------------------------------------------------
# Targets
# ---------------------------------------------------------------------------

def _bc(a: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a per-sample scalar array over trailing NHWC dims."""
    return a.reshape((-1,) + (1,) * (like.ndim - 1)).astype(jnp.float32)


def ddim_transition(x0: jax.Array, eps: jax.Array,
                    abar_next: jax.Array) -> jax.Array:
    """Deterministic (η=0) DDIM transition from a (x̂₀, ε̂) decomposition:
    x′ = √ᾱ′·x̂₀ + √(1−ᾱ′)·ε̂ (samplers.ddim_sample with eta=0)."""
    a = _bc(abar_next, x0)
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * eps


def distill_targets(teacher_fn: Callable[[jax.Array, jax.Array], jax.Array],
                    schedule: DiffusionSchedule, grid: DistillGrid,
                    x_t: jax.Array, idx: jax.Array) -> jax.Array:
    """x̃₀ such that ONE student DDIM step from (x_t, ts[idx]) lands exactly
    on the teacher's TWO-substep result (closed form, module docstring).
    `idx` is a per-sample [n] int array of student step indices."""
    t, t_mid = grid.ts[idx], grid.ts_mid[idx]
    abar_t, abar_mid, abar_next = (grid.abar_t[idx], grid.abar_mid[idx],
                                   grid.abar_next[idx])

    x0_1, eps_1 = schedule.to_x0_eps(teacher_fn(x_t, t), x_t, t)
    x_mid = ddim_transition(x0_1, eps_1, abar_mid)
    x0_2, eps_2 = schedule.to_x0_eps(teacher_fn(x_mid, t_mid), x_mid, t_mid)
    x_next = ddim_transition(x0_2, eps_2, abar_next)

    alpha_t, sigma_t = jnp.sqrt(abar_t), jnp.sqrt(1.0 - abar_t)
    alpha_n, sigma_n = jnp.sqrt(abar_next), jnp.sqrt(1.0 - abar_next)
    ratio = sigma_n / sigma_t
    num = x_next.astype(jnp.float32) - _bc(ratio, x_next) * x_t.astype(jnp.float32)
    den = alpha_n - ratio * alpha_t  # > 0: ᾱ strictly increases over the step
    return num / _bc(den, x_next)


def snr_weight(abar_t: jax.Array) -> jax.Array:
    """Truncated-SNR loss weight max(ᾱ/(1−ᾱ), 1)."""
    return jnp.maximum(abar_t / (1.0 - abar_t), 1.0)


# ---------------------------------------------------------------------------
# One distillation phase
# ---------------------------------------------------------------------------

class DistillState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_distill_step(student_apply: Callable[[Any, jax.Array, jax.Array], jax.Array],
                      teacher_apply: Callable[[Any, jax.Array, jax.Array], jax.Array],
                      teacher_schedule: DiffusionSchedule,
                      student_schedule: DiffusionSchedule,
                      grid: DistillGrid,
                      reparam: bool = False):
    """Build the jitted phase train step `step(state, tparams, x0, key)`.

    `student_apply(params, x, t)` / `teacher_apply(tparams, x, t)` are
    conditioning-complete closures over everything EXCEPT the params (the
    SD path bakes CFG into `teacher_apply` and the cond-embedding into
    both — module docstring). Teacher params ride as a jit ARGUMENT:
    closing over them would embed the weights as HLO constants (see the
    pipeline.py note). With `reparam=True` the target is the teacher's
    own x̂₀ at the SAME t (0-substep warmup for a prediction-type switch)
    instead of the 2-substep x̃₀."""

    # donate the state: full-param distillation holds student params +
    # teacher params + grads + moments resident, and without donation the
    # updated params materialize BESIDE the old ones — the difference
    # between fitting one 16 GB v5e and OOM (bench_distill_train's
    # measured wall). Callers must not reuse a consumed state object
    # (distill_progressive rebinds every step). NOTE: tparams must not
    # alias state.params buffers — pass the teacher as its own copy.
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: DistillState, tparams: Any, x0: jax.Array,
             key: jax.Array):
        k_noise, k_idx = jax.random.split(key)
        n = x0.shape[0]
        idx = jax.random.randint(k_idx, (n,), 0, grid.num_steps)
        t = grid.ts[idx]
        noise = jax.random.normal(k_noise, x0.shape, jnp.float32)
        x_t = teacher_schedule.add_noise(x0, noise, t)

        def teacher_fn(x, tt):
            return teacher_apply(tparams, x, tt)

        if reparam:
            target = teacher_schedule.to_x0_eps(teacher_fn(x_t, t), x_t, t)[0]
        else:
            target = distill_targets(teacher_fn, teacher_schedule, grid,
                                     x_t, idx)
        target = jax.lax.stop_gradient(target)
        w = _bc(snr_weight(grid.abar_t[idx]), x0)

        def loss_fn(params):
            out = student_apply(params, x_t, t)
            x0_pred = student_schedule.to_x0_eps(out, x_t, t)[0]
            return jnp.mean(w * jnp.square(x0_pred.astype(jnp.float32)
                                           - target))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        return state.replace(step=state.step + 1,
                             params=optax.apply_updates(state.params,
                                                        updates),
                             opt_state=new_opt), loss

    return step


def check_reparam_converged(losses: list[float], min_steps: int = 50,
                            plateau_ratio: float = 0.6,
                            rel_err: float | None = None,
                            rel_err_tol: float = 0.15) -> None:
    """Fail loudly when the ε→v reparam warmup did not close the switch.

    An under-trained head switch poisons every later phase (measured:
    a 16→4 distillation whose reparam stopped at loss 4.5e-2 sampled 20×
    WORSE than the teacher's own 4-step grid — BASELINE.md round 3), and
    the failure is silent until sample time. Two criteria:

    1. **Absolute closure** (`rel_err`): the student has the teacher's
       exact capacity (same weights, different output head), so after the
       warmup its x̂₀ must reproduce the teacher's x̂₀ on the phase grid —
       measured rel L2 above `rel_err_tol` means the functional move did
       not close, REGARDLESS of how flat the loss looks (a loss can
       plateau at a bad value — measured: a 200-step warmup plateaued at
       0.068 and the student sampled 4.5× worse than the teacher's grid).
    2. **Plateau**: the mean loss of the last fifth of the warmup must not
       still be dropping steeply (tail < plateau_ratio · previous-fifth)
       — the budget-too-small signal.

    Both criteria activate only at `min_steps`+ warmup steps — below that
    the run is a smoke budget making no convergence claim (tiny CI budgets
    are exempt by construction)."""
    if len(losses) < min_steps:
        return
    if rel_err is not None and rel_err > rel_err_tol:
        raise RuntimeError(
            f"reparam warmup did not close the head switch: student x̂₀ vs "
            f"teacher x̂₀ rel L2 {rel_err:.3f} > {rel_err_tol} after the "
            f"warmup (the student has exact capacity for this target, so "
            f"this is an optimization shortfall, not a ceiling). Distilling "
            f"now compounds the error through every phase. Raise "
            f"--reparam_steps / lower the learning rate, or use "
            f"--student_prediction_type epsilon (exact warm start).")
    k = max(len(losses) // 5, 10)
    head = float(np.mean(losses[:k]))
    tail = float(np.mean(losses[-k:]))
    prev = float(np.mean(losses[-2 * k:-k]))
    if tail <= 1e-3 * head:
        # a ≥1000× drop from the initial loss is converged for practical
        # purposes even if an exact-capacity student keeps descending
        # geometrically toward zero (the ratio test alone is scale-free
        # and would flag machine-precision convergence as "still moving")
        return
    if tail < plateau_ratio * prev:
        raise RuntimeError(
            f"reparam warmup has not converged: loss still dropping steeply "
            f"at the end of the budget (last-{k} mean {tail:.3e} vs "
            f"previous-{k} mean {prev:.3e}). Distilling from an un-closed "
            f"head switch compounds through every phase. Raise "
            f"--reparam_steps (or leave it at -1 to auto-scale to "
            f"--steps_per_phase), or use --student_prediction_type epsilon "
            f"(exact warm start, no warmup needed).")


# ---------------------------------------------------------------------------
# The phase loop
# ---------------------------------------------------------------------------

@dataclass
class DistillPhaseResult:
    num_steps: int
    losses: list[float] = field(default_factory=list)


@dataclass
class DistillResult:
    params: Any                      # final student params
    num_steps: int                   # final student sampling steps
    prediction_type: str             # final student head parameterization
    phases: list[DistillPhaseResult] = field(default_factory=list)


def distill_progressive(
    apply_fn: ModelApply,
    teacher_params: Any,
    schedule: DiffusionSchedule,
    batches: Callable[[], Any],
    start_steps: int,
    end_steps: int,
    steps_per_phase: int,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-2,
    student_prediction_type: str = "epsilon",
    reparam_steps: int = -1,
    guidance_scale: float | None = None,
    cond: jax.Array | None = None,
    uncond: jax.Array | None = None,
    teacher_apply_fn: ModelApply | None = None,
    student_params: Any | None = None,
    log: Callable[[str, float, int], None] | None = None,
) -> DistillResult:
    """Run halving phases start_steps → … → end_steps (both powers-of-two
    multiples of each other; T % (2·start_steps) == 0).

    `batches()` returns an iterable of x₀ batches in model space ([-1,1]
    pixels for the scratch path, scaled latents for the SD path), consumed
    once per phase. With `guidance_scale`/`cond`/`uncond` set, the teacher
    runs CFG over (cond, uncond) while the student consumes `cond` only —
    guidance folding. The student of each phase becomes the next teacher
    (same head parameterization, so `reparam_steps` applies to phase 0
    only).

    By default the phase-0 teacher is `apply_fn(teacher_params, ...)` and
    the student starts FROM the teacher weights (the paper's warm start).
    Pass `teacher_apply_fn` (+ `student_params`) to distill from a foreign
    teacher — a torch-imported model, an analytic denoiser — that the
    student architecture does not share parameters with."""
    if start_steps < end_steps or start_steps % end_steps != 0:
        raise ValueError(f"start_steps={start_steps} must be a multiple "
                         f"of end_steps={end_steps}")
    if reparam_steps < 0:
        # auto-scale: the head switch is a full functional move deserving
        # the same budget as a distillation phase (an under-trained switch
        # compounds through every phase — check_reparam_converged)
        reparam_steps = steps_per_phase
    t_apply = teacher_apply_fn or apply_fn

    if guidance_scale is None:
        def teacher_apply(p, x, t):
            return t_apply(p, x, t)

        def student_apply(p, x, t):
            return apply_fn(p, x, t)
    else:
        def _ctx(x, e):
            return jnp.broadcast_to(e, (x.shape[0],) + e.shape[-2:])

        def teacher_apply(p, x, t):
            # guidance folding: the teacher runs the CFG pair, the student
            # consumes `cond` only (Meng et al. 2023)
            x2 = jnp.concatenate([x, x], 0)
            t2 = jnp.concatenate([t, t], 0)
            e2 = jnp.concatenate([_ctx(x, uncond), _ctx(x, cond)], 0)
            out_u, out_c = jnp.split(t_apply(p, x2, t2, e2), 2, 0)
            return out_u + guidance_scale * (out_c - out_u)

        def student_apply(p, x, t):
            return apply_fn(p, x, t, _ctx(x, cond))

    result = DistillResult(
        params=teacher_params if student_params is None else student_params,
        num_steps=start_steps, prediction_type=student_prediction_type)
    teacher_sched = schedule
    student_sched = DiffusionSchedule(
        betas=schedule.betas, alphas_cumprod=schedule.alphas_cumprod,
        num_train_timesteps=schedule.num_train_timesteps,
        prediction_type=student_prediction_type)
    phase_idx = 0
    n = start_steps
    while n > end_steps:
        n //= 2
        grid = distill_grid(teacher_sched, n)
        # phase 0's teacher is the original (CFG-folding) model; later
        # phases distill the previous student, which is already folded
        phase_teacher = teacher_apply if phase_idx == 0 else student_apply

        def _make_tx(horizon: int) -> optax.GradientTransformation:
            return optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(optax.warmup_cosine_decay_schedule(
                    0.0, learning_rate, max(horizon // 20, 1),
                    max(horizon, 2), 0.0), weight_decay=weight_decay))

        phase = DistillPhaseResult(num_steps=n)

        warmup = reparam_steps if (
            phase_idx == 0
            and student_prediction_type != schedule.prediction_type) else 0
        phase_tparams = teacher_params if phase_idx == 0 else result.params
        warm_params = result.params
        if warmup:
            # The warmup gets its OWN optimizer (sharing the phase optimizer
            # would burn `warmup` steps of its cosine horizon and leave the
            # tail of distillation training at lr ≈ 0) with a CONSTANT lr
            # after the linear ramp — a decaying schedule forces the loss to
            # flatten as lr → 0, which blinds check_reparam_converged (a
            # measured failure: a 200-step cosine warmup "plateaued" at
            # reparam loss 0.069 and the distilled student sampled 4.5×
            # worse than the teacher's own grid). Under constant lr a
            # plateau is a property of the optimization, not the schedule.
            wtx = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(optax.join_schedules(
                    [optax.linear_schedule(0.0, learning_rate,
                                           max(warmup // 20, 1)),
                     optax.constant_schedule(learning_rate)],
                    [max(warmup // 20, 1)]), weight_decay=weight_decay))
            # COPY the student's starting params: the step donates
            # state.params, and the warm start aliases the phase teacher's
            # buffers (student starts FROM the teacher) — donating an
            # aliased buffer while tparams reads it is undefined.
            wstate = DistillState(
                step=jnp.zeros((), jnp.int32),
                params=jax.tree_util.tree_map(jnp.array, warm_params),
                opt_state=wtx.init(warm_params), tx=wtx)
            warm_step = make_distill_step(student_apply, phase_teacher,
                                          teacher_sched, student_sched,
                                          grid, reparam=True)
            done, wlosses = 0, []
            while done < warmup:
                for x0 in batches():
                    if done >= warmup:
                        break
                    key = jax.random.fold_in(jax.random.PRNGKey(17), done)
                    wstate, wloss = warm_step(wstate, phase_tparams, x0, key)
                    wlosses.append(float(wloss))
                    done += 1
            warm_params = wstate.params

            # absolute closure measurement for the guard: student x̂₀ vs
            # teacher x̂₀ on one batch over the phase grid (fixed key)
            @jax.jit
            def _reparam_rel_err(params, tparams, x0):
                k1, k2 = jax.random.split(jax.random.PRNGKey(41))
                n = x0.shape[0]
                idx = jax.random.randint(k2, (n,), 0, grid.num_steps)
                t = grid.ts[idx]
                noise = jax.random.normal(k1, x0.shape, jnp.float32)
                x_t = teacher_sched.add_noise(x0, noise, t)
                t_x0 = teacher_sched.to_x0_eps(
                    phase_teacher(tparams, x_t, t), x_t, t)[0]
                s_x0 = student_sched.to_x0_eps(
                    student_apply(params, x_t, t), x_t, t)[0]
                t_x0 = t_x0.astype(jnp.float32)
                s_x0 = s_x0.astype(jnp.float32)
                return (jnp.linalg.norm(s_x0 - t_x0)
                        / (jnp.linalg.norm(t_x0) + 1e-8))

            x0_probe = next(iter(batches()))
            rel_err = float(_reparam_rel_err(warm_params, phase_tparams,
                                             x0_probe))
            if log:
                log("reparam_loss", float(np.mean(wlosses[-20:])), 0)
                log("reparam_rel_err", rel_err, 0)
            check_reparam_converged(wlosses, rel_err=rel_err)

        tx = _make_tx(steps_per_phase)
        # copy for the same donation-aliasing reason as the warmup state
        state = DistillState(
            step=jnp.zeros((), jnp.int32),
            params=jax.tree_util.tree_map(jnp.array, warm_params),
            opt_state=tx.init(warm_params), tx=tx)

        step = make_distill_step(student_apply, phase_teacher,
                                 teacher_sched, student_sched, grid)
        done = 0
        while done < steps_per_phase:
            for x0 in batches():
                if done >= steps_per_phase:
                    break
                key = jax.random.fold_in(
                    jax.random.PRNGKey(23 + phase_idx), done)
                state, loss = step(state, phase_tparams, x0, key)
                phase.losses.append(float(loss))
                done += 1
        if log:
            log(f"distill_loss_{n}steps",
                float(np.mean(phase.losses[-20:])), phase_idx)

        result.params = state.params
        result.num_steps = n
        result.phases.append(phase)
        teacher_sched = student_sched  # student becomes the next teacher
        phase_idx += 1
    return result
