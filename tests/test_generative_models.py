"""UNet2D / UNet2DCondition / VAE / CLIP text: shapes, conditioning
sensitivity, and full-size architectures under jax.eval_shape (no compute —
SURVEY §4 plan item c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    DiagonalGaussian,
    HashTokenizer,
    TINY_TEXT_CONFIG,
    UNet2D,
    UNet2DCondition,
    polyp_scratch_unet,
    sd14_unet,
    tiny_condition_unet,
    tiny_vae,
)
from polyp_tpu.models.clip_tokenizer import CLIPBPETokenizer


def _param_count(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.slow
class TestUNet2D:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = UNet2D(block_out_channels=(32, 64),
                       down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                       up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                       layers_per_block=1)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.asarray([0, 500])
        params = model.init(jax.random.PRNGKey(0), x, t)
        return model, params

    def test_shape_preserved(self, tiny):
        model, params = tiny
        out = model.apply(params, jnp.zeros((2, 16, 16, 3)),
                          jnp.asarray([10, 20]))
        assert out.shape == (2, 16, 16, 3)
        assert out.dtype == jnp.float32

    def test_timestep_sensitivity(self, tiny):
        model, params = tiny
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
        a = model.apply(params, x, jnp.asarray([0]))
        b = model.apply(params, x, jnp.asarray([900]))
        assert float(jnp.max(jnp.abs(a - b))) > 1e-4

    def test_reference_scratch_arch_shapes(self):
        # full 224px architecture flows without compute via eval_shape
        model = polyp_scratch_unet(dtype=jnp.float32)
        x = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.int32)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
        out = jax.eval_shape(model.apply, variables, x, t)
        assert out.shape == (1, 224, 224, 3)
        # diffusers UNet2DModel with this config is ~90-115M params
        assert 5e7 < _param_count(variables) < 2e8

    def test_cross_attention_conditioning(self):
        model = UNet2D(block_out_channels=(32, 64),
                       down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                       up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                       layers_per_block=1, cross_attention_dim=16)
        x = jnp.zeros((1, 16, 16, 3))
        t = jnp.asarray([5])
        ctx = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
        params = model.init(jax.random.PRNGKey(1), x, t, ctx)
        a = model.apply(params, x, t, ctx)
        b = model.apply(params, x, t, 2.0 * ctx)
        assert float(jnp.max(jnp.abs(a - b))) > 1e-5


@pytest.mark.slow
class TestUNetCondition:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = tiny_condition_unet()
        x = jnp.zeros((1, 8, 8, 4))
        t = jnp.asarray([3])
        ctx = jnp.zeros((1, 16, 32))
        params = model.init(jax.random.PRNGKey(0), x, t, ctx)
        return model, params

    def test_shape(self, tiny):
        model, params = tiny
        out = model.apply(params, jnp.zeros((2, 8, 8, 4)),
                          jnp.asarray([1, 2]), jnp.zeros((2, 16, 32)))
        assert out.shape == (2, 8, 8, 4)

    def test_context_sensitivity(self, tiny):
        model, params = tiny
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
        t = jnp.asarray([3])
        c1 = jnp.zeros((1, 16, 32))
        c2 = jnp.ones((1, 16, 32))
        a = model.apply(params, x, t, c1)
        b = model.apply(params, x, t, c2)
        assert float(jnp.max(jnp.abs(a - b))) > 1e-5

    def test_odd_latent_sizes(self):
        """Regression: 224px images give 28×28 latents whose down path hits
        odd sizes (28→14→7→4); the up path must resize to the skip's dims
        (diffusers forward_upsample_size), not a blind ×2 (ADVICE r1 high)."""
        model = sd14_unet(dtype=jnp.float32)
        for hw in (28, 28 // 2, 30):
            x = jax.ShapeDtypeStruct((1, hw, hw, 4), jnp.float32)
            t = jax.ShapeDtypeStruct((1,), jnp.int32)
            ctx = jax.ShapeDtypeStruct((1, 77, 768), jnp.float32)
            variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, ctx)
            out = jax.eval_shape(model.apply, variables, x, t, ctx)
            assert out.shape == (1, hw, hw, 4)

    def test_scratch_unet_odd_image_size(self):
        from polyp_tpu.models.unet2d import polyp_scratch_unet
        model = polyp_scratch_unet(dtype=jnp.float32)
        x = jax.ShapeDtypeStruct((1, 100, 100, 3), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.int32)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
        out = jax.eval_shape(model.apply, variables, x, t)
        assert out.shape == (1, 100, 100, 3)

    def test_sd14_param_count(self):
        model = sd14_unet(dtype=jnp.float32)
        x = jax.ShapeDtypeStruct((1, 32, 32, 4), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.int32)
        ctx = jax.ShapeDtypeStruct((1, 77, 768), jnp.float32)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, ctx)
        n = _param_count(variables)
        # UNet2DConditionModel SD-v1-4 has 859.52M parameters
        assert abs(n - 859.5e6) / 859.5e6 < 0.02, n
        out = jax.eval_shape(model.apply, variables, x, t, ctx)
        assert out.shape == (1, 32, 32, 4)


@pytest.mark.slow
class TestVAE:
    @pytest.fixture(scope="class")
    def vae(self):
        model = tiny_vae()
        x = jnp.zeros((1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        return model, params

    def test_encode_decode_shapes(self, vae):
        model, params = vae
        posterior = model.apply(params, jnp.zeros((2, 32, 32, 3)),
                                method=model.encode)
        assert posterior.mean.shape == (2, 4, 4, 4)  # 8× downsample, 4ch
        z = posterior.sample(jax.random.PRNGKey(0))
        recon = model.apply(params, z, method=model.decode)
        assert recon.shape == (2, 32, 32, 3)

    def test_diagonal_gaussian(self):
        p = jnp.concatenate([jnp.zeros((1, 2, 2, 4)),
                             jnp.full((1, 2, 2, 4), -100.0)], axis=-1)
        d = DiagonalGaussian(p)
        # logvar clamped at -30 → near-deterministic sample = mean
        s = d.sample(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-3)

    def test_sd_vae_param_count(self):
        model = AutoencoderKL()
        x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
        k = jax.random.PRNGKey(0)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, k)
        n = _param_count(variables)
        # SD AutoencoderKL has 83.65M params
        assert abs(n - 83.65e6) / 83.65e6 < 0.02, n


class TestCLIPText:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = CLIPTextModel(TINY_TEXT_CONFIG)
        ids = jnp.zeros((1, 16), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        return model, params

    def test_shape(self, tiny):
        model, params = tiny
        out = model.apply(params, jnp.ones((2, 16), jnp.int32))
        assert out.shape == (2, 16, 32)

    def test_causal_masking(self, tiny):
        model, params = tiny
        ids_a = jnp.asarray([[1, 2, 3, 4] + [0] * 12], jnp.int32)
        ids_b = ids_a.at[0, 3].set(9)  # change a later token
        a = model.apply(params, ids_a)
        b = model.apply(params, ids_b)
        # earlier positions unaffected by later-token change
        np.testing.assert_allclose(np.asarray(a[0, :3]), np.asarray(b[0, :3]),
                                   atol=1e-5)
        assert float(jnp.max(jnp.abs(a[0, 3] - b[0, 3]))) > 1e-4

    def test_sd14_text_param_count(self):
        model = CLIPTextModel()
        ids = jax.ShapeDtypeStruct((1, 77), jnp.int32)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids)
        n = _param_count(variables)
        # CLIP ViT-L/14 text tower ≈ 123.06M params
        assert abs(n - 123.06e6) / 123.06e6 < 0.02, n


class TestTokenizers:
    def test_hash_tokenizer_contract(self):
        tok = HashTokenizer(max_length=16)
        ids = tok(["a polyp image", "a polyp image"])
        assert ids.shape == (2, 16)
        np.testing.assert_array_equal(ids[0], ids[1])
        assert ids[0, 0] == tok.bos_id

    def test_hash_tokenizer_add_tokens(self):
        tok = HashTokenizer(vocab_size=100, max_length=8)
        added = tok.add_tokens(["sks"])
        assert added == 1
        assert tok.convert_tokens_to_ids("sks") == 100
        ids = tok("sks polyp")
        assert 100 in ids[0]

    def test_bpe_tokenizer_minimal_vocab(self, tmp_path):
        # chars + </w>-suffixed chars + specials; one merge rule "a b"
        vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
        for i, ch in enumerate("abcdefgh"):
            vocab[ch] = 2 + i
            vocab[ch + "</w>"] = 10 + i
        vocab["ab</w>"] = 20
        (tmp_path / "vocab.json").write_text(__import__("json").dumps(vocab))
        (tmp_path / "merges.txt").write_text("#version\na b</w>\n")
        tok = CLIPBPETokenizer(tmp_path / "vocab.json", tmp_path / "merges.txt",
                               max_length=8)
        ids = tok("ab cd")
        # "ab" merges to ab</w> (20); "cd" → c(4), d</w>(13)
        assert ids.shape == (1, 8)
        assert ids[0].tolist()[:5] == [0, 20, 4, 13, 1]
        assert (ids[0, 5:] == 1).all()  # EOS padding

    def test_bpe_add_tokens_bypass_bpe(self, tmp_path):
        vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1,
                 "s": 2, "k": 3, "s</w>": 4, "k</w>": 5}
        (tmp_path / "vocab.json").write_text(__import__("json").dumps(vocab))
        (tmp_path / "merges.txt").write_text("")
        tok = CLIPBPETokenizer(tmp_path / "vocab.json", tmp_path / "merges.txt",
                               max_length=8)
        tok.add_tokens(["sks"])
        ids = tok("sks")
        assert ids[0, 1] == tok.convert_tokens_to_ids("sks") == 6
