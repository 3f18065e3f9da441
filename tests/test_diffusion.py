"""Schedule & sampler correctness.

Key device-free oracle: if the data distribution is a point mass at x*, the
exact noise predictor is ε(x,t) = (x − √ᾱ_t·x*)/√(1−ᾱ_t); every correct
sampler must then drive any x_T to (nearly) exactly x* — this validates the
stepping algebra of DDPM/DDIM/DPM++/UniPC without a neural net.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.diffusion import (
    DiffusionSchedule,
    ddim_sample,
    ddpm_sample,
    epsilon_mse_loss,
    unipc_sample,
    with_cfg,
)
from polyp_tpu.diffusion.samplers import dpmpp_2m_sample
from polyp_tpu.diffusion.schedule import inference_timesteps


@pytest.fixture(scope="module")
def schedule():
    return DiffusionSchedule.create(num_train_timesteps=1000)


class TestSchedule:
    def test_linear_betas_match_closed_form(self, schedule):
        betas = np.asarray(schedule.betas)
        assert betas[0] == pytest.approx(1e-4, rel=1e-5)
        assert betas[-1] == pytest.approx(2e-2, rel=1e-5)
        abar = np.asarray(schedule.alphas_cumprod)
        np.testing.assert_allclose(abar, np.cumprod(1 - betas), rtol=1e-5)
        assert (np.diff(abar) < 0).all()

    def test_scaled_linear_sd_schedule(self):
        s = DiffusionSchedule.create(1000, "scaled_linear", 0.00085, 0.012)
        betas = np.asarray(s.betas)
        assert betas[0] == pytest.approx(0.00085, rel=1e-4)
        assert betas[-1] == pytest.approx(0.012, rel=1e-4)

    def test_add_noise_formula(self, schedule):
        x0 = jnp.ones((2, 4, 4, 3))
        noise = jnp.full((2, 4, 4, 3), 2.0)
        t = jnp.asarray([0, 500])
        out = schedule.add_noise(x0, noise, t)
        abar = np.asarray(schedule.alphas_cumprod)
        for i, ti in enumerate([0, 500]):
            expected = np.sqrt(abar[ti]) * 1.0 + np.sqrt(1 - abar[ti]) * 2.0
            np.testing.assert_allclose(out[i, 0, 0, 0], expected, rtol=1e-5)

    def test_x0_eps_roundtrip(self, schedule):
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 4, 4, 3))
        noise = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 4, 3))
        t = jnp.asarray([100, 900])
        xt = schedule.add_noise(x0, noise, t)
        x0_rec, eps_rec = schedule.to_x0_eps(noise, xt, t)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                                   rtol=1e-3, atol=1e-4)

    def test_inference_timesteps_descending(self):
        ts = np.asarray(inference_timesteps(1000, 25))
        assert len(ts) == 25
        assert ts[0] > ts[-1]
        assert (np.diff(ts) < 0).all()


def _oracle_model(schedule, x_star):
    """Exact ε for a point-mass data distribution at x_star."""
    abar = schedule.alphas_cumprod

    def model_fn(x, t):
        a = abar[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(a) * x_star) / jnp.sqrt(1 - a)

    return model_fn


class TestSamplersOracle:
    shape = (2, 8, 8, 3)

    @pytest.fixture(scope="class")
    def x_star(self):
        return 0.5 * jnp.sin(jnp.arange(np.prod(self.shape))
                             .reshape(self.shape).astype(jnp.float32))

    @pytest.mark.parametrize("name,fn,steps,tol", [
        ("ddim", ddim_sample, 50, 2e-2),
        ("dpmpp_2m", dpmpp_2m_sample, 25, 2e-2),
        ("unipc", unipc_sample, 25, 2e-2),
        ("ddpm", ddpm_sample, 100, 1.5e-1),
    ])
    def test_converges_to_point_mass(self, schedule, x_star, name, fn, steps, tol):
        model_fn = _oracle_model(schedule, x_star)
        kwargs = {"num_steps": steps}
        if name == "ddpm":
            kwargs["clip_sample"] = False
        if name == "ddim":
            # exact convergence needs ᾱ→1 at the last step; the SD-v1
            # default (set_alpha_to_one=False) stops at ᾱ₀ ≈ 0.9999
            kwargs["final_alpha_to_one"] = True
        out = fn(model_fn, schedule, self.shape, jax.random.PRNGKey(0), **kwargs)
        err = float(jnp.max(jnp.abs(out - x_star)))
        assert err < tol, f"{name}: {err}"

    def test_ddim_deterministic_per_seed(self, schedule, x_star):
        model_fn = _oracle_model(schedule, x_star)
        a = ddim_sample(model_fn, schedule, self.shape, jax.random.PRNGKey(7), 20)
        b = ddim_sample(model_fn, schedule, self.shape, jax.random.PRNGKey(7), 20)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ddim_eta_adds_stochasticity(self, schedule):
        # An imperfect model (ε̂ = x/2) makes the trajectory noise-dependent;
        # with the same key, η=0 vs η=1 must then diverge.
        def model_fn(x, t):
            return 0.5 * x

        a = ddim_sample(model_fn, schedule, self.shape, jax.random.PRNGKey(1),
                        20, eta=0.0)
        b = ddim_sample(model_fn, schedule, self.shape, jax.random.PRNGKey(1),
                        20, eta=1.0)
        assert float(jnp.max(jnp.abs(a - b))) > 1e-4

    def test_unipc_converges_at_low_step_budget(self, schedule, x_star):
        """On the linear point-mass oracle DDIM is *exact* (x̂₀ ≡ x*), so a
        relative DDIM comparison is vacuous; assert the order-2 solver's own
        absolute convergence at a 10-step budget instead."""
        model_fn = _oracle_model(schedule, x_star)
        e_unipc = float(jnp.mean(jnp.abs(unipc_sample(
            model_fn, schedule, self.shape, jax.random.PRNGKey(3), 10) - x_star)))
        assert e_unipc < 5e-3, e_unipc


class TestCFG:
    def test_cfg_combines_cond_uncond(self, schedule):
        def raw_fn(x, t, emb):
            # per-sample conditioning shift (a global mean would collapse the
            # uncond/cond halves of the doubled batch to the same value)
            return jnp.zeros_like(x) + jnp.mean(emb, axis=(1, 2))[:, None, None, None]

        cond = jnp.ones((1, 4, 8))
        uncond = jnp.zeros((1, 4, 8))
        fn = with_cfg(raw_fn, cond, uncond, guidance_scale=7.5)
        out = fn(jnp.zeros((2, 4, 4, 3)), jnp.zeros((2,), jnp.int32))
        # out = u + 7.5 (c - u) = 0 + 7.5·1
        np.testing.assert_allclose(np.asarray(out), 7.5, rtol=1e-5)


class TestLoss:
    def test_epsilon_loss_zero_at_target(self, schedule):
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 4, 4, 3))
        noise = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 4, 3))
        t = jnp.asarray([10, 500])
        assert float(epsilon_mse_loss(schedule, noise, x0, noise, t)) == 0.0
        assert float(epsilon_mse_loss(schedule, noise + 1, x0, noise, t)) \
            == pytest.approx(1.0)


class TestCFGFolded:
    def test_guidance_none_is_cond_only_single_batch(self):
        """with_cfg(guidance_scale=None): the distilled-student contract —
        cond-only forwards at 1x batch (no CFG doubling), equal to calling
        the raw model with the cond embedding broadcast."""
        import jax
        import jax.numpy as jnp

        from polyp_tpu.diffusion.samplers import with_cfg

        seen = []

        def raw_fn(x, t, emb):
            seen.append(x.shape[0])
            return x * 0.1 + jnp.mean(emb)

        cond = jnp.ones((1, 7, 4))
        uncond = jnp.zeros((1, 7, 4))
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 2, 1))
        t = jnp.zeros((3,), jnp.int32)
        folded = with_cfg(raw_fn, cond, uncond, None)(x, t)
        assert seen == [3]  # 1x batch, not 2x
        expected = raw_fn(x, t, jnp.broadcast_to(cond, (3, 7, 4)))
        assert jnp.allclose(folded, expected)
