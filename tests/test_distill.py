"""Progressive distillation (train/distill.py).

The key property tests exploit that deterministic DDIM is a MAP from
initial noise to sample, and distillation preserves that map:

* closed-form target identity — one student DDIM step from the x̃₀ target
  lands EXACTLY on the teacher's two-substep result (pure algebra, no
  training);
* end-to-end convergence against an ANALYTIC teacher — for Gaussian data
  the exact denoiser E[ε|x_t] is affine in x_t, so an affine-per-timestep
  student has zero approximation error and the distilled 4-step sampler
  must reproduce the analytic teacher's 64-step DDIM output pointwise
  from the same key, including through the CFG-folding path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.diffusion import DiffusionSchedule, ddim_sample
from polyp_tpu.diffusion.schedule import inference_timesteps
from polyp_tpu.train.distill import (DistillState, ddim_transition,
                                     distill_grid, distill_progressive,
                                     distill_targets, make_distill_step,
                                     snr_weight)


class TestGrid:
    def test_trailing_grids_nest_at_every_phase(self):
        sched = DiffusionSchedule.create(1000)
        for n in (4, 5, 10, 25, 50, 100):
            g = distill_grid(sched, n)
            ts2 = np.asarray(inference_timesteps(1000, 2 * n, "trailing"))
            np.testing.assert_array_equal(np.asarray(g.ts), ts2[0::2])
            np.testing.assert_array_equal(np.asarray(g.ts_mid), ts2[1::2])
            assert (np.asarray(g.ts) > np.asarray(g.ts_mid)).all()
            # midpoint of the final step exists (no special-casing):
            assert int(g.ts_mid[-1]) == 1000 // (2 * n) - 1 >= 0

    def test_abar_tables_match_schedule(self):
        sched = DiffusionSchedule.create(1000)
        g = distill_grid(sched, 10)
        abar = np.asarray(sched.alphas_cumprod)
        np.testing.assert_allclose(np.asarray(g.abar_t),
                                   abar[np.asarray(g.ts)])
        # transition targets: next grid point, endpoint = ᾱ₀
        np.testing.assert_allclose(np.asarray(g.abar_next[:-1]),
                                   abar[np.asarray(g.ts[1:])])
        assert float(g.abar_next[-1]) == pytest.approx(float(abar[0]))

    def test_indivisible_raises(self):
        sched = DiffusionSchedule.create(1000)
        with pytest.raises(ValueError, match="nested"):
            distill_grid(sched, 7)  # 1000 % 14 != 0


class TestTargetIdentity:
    def test_one_step_from_target_equals_two_teacher_steps(self):
        """Pure algebra: plugging x̃₀ into a single DDIM transition must
        reproduce the teacher's two-substep result bit-near-exactly, for
        every student step index and a nonlinear teacher."""
        sched = DiffusionSchedule.create(1024)
        n = 8
        g = distill_grid(sched, n)
        key = jax.random.PRNGKey(0)
        x_t = jax.random.normal(key, (n, 6, 6, 3))
        idx = jnp.arange(n)  # cover every step incl. the endpoint

        def teacher_fn(x, t):
            # arbitrary smooth nonlinear "ε-model"
            tt = t.reshape((-1, 1, 1, 1)).astype(jnp.float32)
            return jnp.tanh(x) * (0.9 + 1e-4 * tt) + 0.05 * x ** 2

        target = distill_targets(teacher_fn, sched, g, x_t, idx)

        # teacher's two explicit substeps
        x0_1, eps_1 = sched.to_x0_eps(teacher_fn(x_t, g.ts[idx]), x_t,
                                      g.ts[idx])
        x_mid = ddim_transition(x0_1, eps_1, g.abar_mid[idx])
        x0_2, eps_2 = sched.to_x0_eps(teacher_fn(x_mid, g.ts_mid[idx]),
                                      x_mid, g.ts_mid[idx])
        x_next = ddim_transition(x0_2, eps_2, g.abar_next[idx])

        # one student step using the target as x̂₀
        a_t = g.abar_t[idx].reshape((-1, 1, 1, 1))
        eps_tilde = (x_t - jnp.sqrt(a_t) * target) / jnp.sqrt(1 - a_t)
        one_step = ddim_transition(target, eps_tilde, g.abar_next[idx])
        np.testing.assert_allclose(np.asarray(one_step),
                                   np.asarray(x_next), rtol=2e-4, atol=2e-4)

    def test_snr_weight_truncates_at_one(self):
        w = np.asarray(snr_weight(jnp.asarray([0.9999, 0.5, 1e-5])))
        assert w[0] > 1000 and w[1] == 1.0 and w[2] == 1.0


# ---------------------------------------------------------------------------
# Analytic-teacher end-to-end: Gaussian data, affine student
# ---------------------------------------------------------------------------

def _analytic_eps(mu, s2):
    """Exact E[ε | x_t] for x₀ ~ N(μ, s²I): affine in x_t."""

    def teacher_apply(params, x, t, ctx=None):
        del params, ctx
        sched = teacher_apply.sched
        abar = sched.alphas_cumprod[t].reshape((-1, 1, 1, 1))
        a, sig = jnp.sqrt(abar), jnp.sqrt(1 - abar)
        denom = abar * s2 + (1 - abar)
        x0_post = mu + (a * s2 / denom) * (x - a * mu)
        return (x - a * x0_post) / sig

    return teacher_apply


def _affine_student(T):
    """Per-timestep affine v-model: out = a[t]·x + b[t] — contains the
    exact solution for Gaussian data, so distillation can drive the loss
    to ~0."""
    params = {"a": jnp.zeros((T,)), "b": jnp.zeros((T,))}

    def apply_fn(p, x, t, ctx=None):
        del ctx
        sh = (-1, 1, 1, 1)
        return p["a"][t].reshape(sh) * x + p["b"][t].reshape(sh)

    return params, apply_fn


@pytest.mark.slow
class TestProgressiveAnalytic:
    def _run(self, guidance):
        T, shape = 256, (4, 4, 1)
        mu, s2 = 0.6, 0.04
        sched = DiffusionSchedule.create(T)
        teacher = _analytic_eps(mu, s2)
        teacher.sched = sched
        params, student_apply = _affine_student(T)

        key = jax.random.PRNGKey(5)
        data = mu + jnp.sqrt(s2) * jax.random.normal(key, (64,) + shape)

        def batches():
            return [data[i:i + 16] for i in range(0, 64, 16)]

        cond = unc = None
        if guidance is not None:
            cond = jnp.zeros((1, 4, 8))
            unc = jnp.zeros((1, 4, 8))

        result = distill_progressive(
            student_apply, None, sched, batches, start_steps=16,
            end_steps=4, steps_per_phase=400, learning_rate=0.05,
            weight_decay=0.0, student_prediction_type="v_prediction",
            guidance_scale=guidance, cond=cond, uncond=unc,
            teacher_apply_fn=teacher, student_params=params)
        assert result.num_steps == 4
        assert len(result.phases) == 2
        # loss at the end of each phase must be tiny (exact-capacity student)
        for ph in result.phases:
            assert np.mean(ph.losses[-20:]) < 1e-4, ph.num_steps

        # THE property: same key → distilled 4-step ≈ teacher 16-step DDIM
        v_sched = DiffusionSchedule.create(
            T, prediction_type="v_prediction")
        skey = jax.random.PRNGKey(11)

        def teacher_fn(x, t):
            out = teacher(None, x, t)
            if guidance is not None:
                # the analytic eps is already the guided model here (CFG of
                # identical cond/uncond teachers is the teacher itself)
                pass
            return out

        ref = ddim_sample(teacher_fn, sched, (8,) + shape, skey, 16,
                          spacing="trailing", steps_offset=0)

        def student_fn(x, t):
            return student_apply(result.params, x, t)

        got = ddim_sample(student_fn, v_sched, (8,) + shape, skey, 4,
                          spacing="trailing", steps_offset=0)
        err = float(jnp.sqrt(jnp.mean((got - ref) ** 2))
                    / (jnp.sqrt(jnp.mean(ref ** 2)) + 1e-8))
        assert err < 0.02, f"distilled 4-step vs teacher 16-step rel RMSE {err}"
        # sanity: samples look like the data distribution
        assert abs(float(jnp.mean(got)) - mu) < 0.1

    def test_uncond_pixel_path(self):
        self._run(None)

    def test_cfg_folding_path(self):
        """Same convergence through the guidance-folding code path (teacher
        wrapped in the CFG pair, student cond-only)."""
        self._run(3.0)


@pytest.mark.slow
class TestSDPathIntegration:
    def test_cfg_folded_tiny_unet_distills(self):
        """Real-model plumbing: a tiny conditional flax UNet teacher under
        CFG folding distills into a cond-only v-student (reparam warmup +
        distill phase), and the result samples through the real
        `ddim_sample(spacing="trailing")` path.

        Scope note: convergence QUALITY is proven by
        TestProgressiveAnalytic (an exact-capacity student reproduces the
        teacher's trajectory to <2%, including through CFG folding). A
        randomly-initialized tiny UNet has no learnable distillation
        signal — measured: at guidance 1.0 its 1-step x̂₀ already matches
        its 2-substep x̃₀ to 0.0035 (the random net is too smooth to bend
        its own trajectory), and at guidance 4.0 the folded target exceeds
        the architecture's capacity — so this test asserts the plumbing
        invariants that hold regardless of learnability: phase structure,
        finite decreasing losses, both warmup and distill phases actually
        training, and non-divergent sampling."""
        from polyp_tpu.diffusion import with_cfg
        from polyp_tpu.models import tiny_condition_unet

        T, latent = 64, 8
        sched = DiffusionSchedule.create(T, "scaled_linear", 0.00085, 0.012)
        unet = tiny_condition_unet()
        k = jax.random.PRNGKey(0)
        params = unet.init({"params": k},
                           jnp.zeros((1, latent, latent, 4)),
                           jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 77, 32)))["params"]
        cond = jax.random.normal(k, (1, 77, 32))
        uncond = jnp.zeros((1, 77, 32))

        def apply_fn(p, x, t, ctx=None):
            return unet.apply({"params": p}, x, t, ctx)

        data = 0.3 * jax.random.normal(jax.random.PRNGKey(2),
                                       (32, latent, latent, 4))

        def batches():
            return [data[i:i + 8] for i in range(0, 32, 8)]

        result = distill_progressive(
            apply_fn, params, sched, batches, start_steps=8, end_steps=4,
            steps_per_phase=60, learning_rate=3e-3, weight_decay=0.0,
            student_prediction_type="v_prediction",
            reparam_steps=30, guidance_scale=4.0, cond=cond, uncond=uncond)
        assert result.num_steps == 4
        assert result.prediction_type == "v_prediction"
        assert len(result.phases) == 1
        losses = result.phases[0].losses
        assert len(losses) == 60  # reparam steps must NOT eat the phase
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < np.mean(losses[:10])
        # training actually moved the weights (reparam + distill ran)
        delta = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                             params, result.params)
        assert max(jax.tree.leaves(delta)) > 1e-3

        def t_fn(x, t, emb):
            return apply_fn(params, x, t, emb)

        def _ctx(x):
            return jnp.broadcast_to(cond, (x.shape[0],) + cond.shape[-2:])

        v_sched = DiffusionSchedule.create(
            T, "scaled_linear", 0.00085, 0.012,
            prediction_type="v_prediction")

        # --- sampling plumbing: trailing DDIM runs, no divergence ---------
        skey = jax.random.PRNGKey(9)
        teacher_cfg = with_cfg(t_fn, cond, uncond, 4.0)
        ref = ddim_sample(teacher_cfg, sched, (4, latent, latent, 4), skey,
                          8, spacing="trailing", steps_offset=0)

        def student_fn(x, t):
            return apply_fn(result.params, x, t, _ctx(x))

        got = ddim_sample(student_fn, v_sched, (4, latent, latent, 4), skey,
                          4, spacing="trailing", steps_offset=0)
        assert np.isfinite(np.asarray(got)).all()
        rms = float(jnp.sqrt(jnp.mean(got ** 2)))
        ref_rms = float(jnp.sqrt(jnp.mean(ref ** 2)))
        assert rms < 5.0 * ref_rms, (rms, ref_rms)


class TestDistillStepMechanics:
    def test_loss_decreases_and_state_advances(self):
        """A few optimizer steps on the affine student must reduce the
        distillation loss monotonically-ish from the zero init."""
        import optax

        T = 64
        sched = DiffusionSchedule.create(T)
        teacher = _analytic_eps(0.5, 0.1)
        teacher.sched = sched
        params, apply_fn = _affine_student(T)
        v_sched = DiffusionSchedule.create(T, prediction_type="v_prediction")
        g = distill_grid(sched, 8)
        tx = optax.adam(0.05)
        state = DistillState(step=jnp.zeros((), jnp.int32), params=params,
                             opt_state=tx.init(params), tx=tx)
        step = make_distill_step(apply_fn, teacher, sched, v_sched, g)
        x0 = 0.5 + jnp.sqrt(0.1) * jax.random.normal(jax.random.PRNGKey(1),
                                                     (16, 4, 4, 1))
        losses = []
        for i in range(30):
            state, loss = step(state, None, x0, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert int(state.step) == 30
        assert losses[-1] < losses[0] * 0.2, losses[::10]

    def test_reparam_warmup_targets_teacher_x0(self):
        """reparam=True drives the student toward the teacher's own x̂₀ at
        the same t: with an exact-capacity student the warm loss → ~0."""
        import optax

        T = 64
        sched = DiffusionSchedule.create(T)
        teacher = _analytic_eps(0.0, 1.0)
        teacher.sched = sched
        params, apply_fn = _affine_student(T)
        v_sched = DiffusionSchedule.create(T, prediction_type="v_prediction")
        g = distill_grid(sched, 8)
        tx = optax.adam(0.05)
        state = DistillState(step=jnp.zeros((), jnp.int32), params=params,
                             opt_state=tx.init(params), tx=tx)
        step = make_distill_step(apply_fn, teacher, sched, v_sched, g,
                                 reparam=True)
        x0 = jax.random.normal(jax.random.PRNGKey(2), (16, 4, 4, 1))
        loss = None
        for i in range(60):
            state, loss = step(state, None, x0, jax.random.PRNGKey(i))
        assert float(loss) < 5e-3


@pytest.mark.slow
class TestDistillOnMesh:
    def test_step_composes_with_data_parallel_mesh(self):
        """The distill step is plain jit over pytrees, so DP composes the
        same way as the other trainers: shard the batch on 'data', loss
        matches the unsharded run."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        T = 64
        sched = DiffusionSchedule.create(T)
        teacher = _analytic_eps(0.2, 0.3)
        teacher.sched = sched
        params, apply_fn = _affine_student(T)
        v_sched = DiffusionSchedule.create(T, prediction_type="v_prediction")
        g = distill_grid(sched, 8)
        import optax
        tx = optax.adam(0.01)
        state = DistillState(step=jnp.zeros((), jnp.int32), params=params,
                             opt_state=tx.init(params), tx=tx)
        step = make_distill_step(apply_fn, teacher, sched, v_sched, g)
        x0 = 0.2 + jnp.sqrt(0.3) * jax.random.normal(jax.random.PRNGKey(3),
                                                     (16, 4, 4, 1))
        _, loss_plain = step(state, None, x0, jax.random.PRNGKey(7))

        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        x0_sh = jax.device_put(x0, NamedSharding(mesh, P("data")))
        _, loss_sh = step(state, None, x0_sh, jax.random.PRNGKey(7))
        np.testing.assert_allclose(float(loss_sh), float(loss_plain),
                                   rtol=1e-5)


class TestReparamGuard:
    """check_reparam_converged — the loud-failure guard for the ε→v head
    switch (the measured round-3 failure mode: an under-trained warmup
    compounds through every phase)."""

    def test_plateaued_warmup_passes(self):
        from polyp_tpu.train.distill import check_reparam_converged
        # geometric descent that flattens well before the end
        losses = [1e-1 * (0.8 ** i) for i in range(60)] + [2e-6] * 60
        check_reparam_converged(losses)  # no raise

    def test_still_descending_raises(self):
        from polyp_tpu.train.distill import check_reparam_converged
        # steady geometric descent to the last step: NOT converged
        losses = [1e-1 * (0.93 ** i) for i in range(100)]
        with pytest.raises(RuntimeError, match="reparam warmup"):
            check_reparam_converged(losses)

    def test_tiny_budgets_exempt(self):
        from polyp_tpu.train.distill import check_reparam_converged
        # below min_steps there is no plateau signal — smoke budgets pass
        check_reparam_converged([1e-1 * (0.5 ** i) for i in range(20)])

    def test_auto_reparam_scales_to_phase_budget(self):
        """reparam_steps=-1 gives the head switch the full phase budget
        (and the resulting warmup converges on the analytic teacher)."""
        T = 64
        sched = DiffusionSchedule.create(T)
        teacher = _analytic_eps(0.3, 0.05)
        teacher.sched = sched
        params, apply_fn = _affine_student(T)
        data = 0.3 + jnp.sqrt(0.05) * jax.random.normal(
            jax.random.PRNGKey(5), (32, 4, 4, 1))

        def batches():
            return [data[i:i + 16] for i in range(0, 32, 16)]

        logged = {}
        result = distill_progressive(
            apply_fn, None, sched, batches, start_steps=8, end_steps=4,
            steps_per_phase=200, learning_rate=0.05, weight_decay=0.0,
            student_prediction_type="v_prediction", reparam_steps=-1,
            teacher_apply_fn=teacher, student_params=params,
            log=lambda k, v, s: logged.setdefault(k, v))
        assert result.num_steps == 4
        # the auto-scaled warmup ran (a reparam loss was logged, i.e.
        # reparam_steps=-1 resolved to steps_per_phase > 0) and the run
        # passed the convergence guard without raising
        assert "reparam_loss" in logged
        assert np.isfinite(logged["reparam_loss"])
