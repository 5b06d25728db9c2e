from mmfn_tpu.train.engine import Engine, TrainState, create_train_state, fast_init_train_state, make_train_step, make_eval_step  # noqa: F401
