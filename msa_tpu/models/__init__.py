from msa_tpu.models.fusion import FusionMLP, FusionModel  # noqa: F401
