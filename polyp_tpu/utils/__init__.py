from polyp_tpu.utils.rng import key_for, batch_seed_key  # noqa: F401
