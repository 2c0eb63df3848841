# SM3Det e8k2 variant (parity: local_configs/main_SM3Det.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(backbone=dict(num_experts=8, top_k=2))
work_dir = "./work_dirs/main_SM3Det"
