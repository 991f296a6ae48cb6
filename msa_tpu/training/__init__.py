from msa_tpu.training.train_fusion import TrainState, make_train_step, train  # noqa: F401
