from msa_tpu.visualizers.overlay import StreamingVisualizer  # noqa: F401
