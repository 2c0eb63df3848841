# default runtime (parity with configs/_base_/default_runtime.py)
log_interval = 50
checkpoint_interval = None     # set per-experiment (iters)
work_dir = "./work_dirs/default"
seed = 0
