from msa_tpu.core import config, emotions, schema  # noqa: F401
