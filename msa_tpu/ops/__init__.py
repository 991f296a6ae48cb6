from msa_tpu.ops import normalization  # noqa: F401
