# SM3Det flagship with convnext-t backbone (e8k3 + DLA)
# (parity: local_configs/SM3Det_convnext_t.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(
    backbone=dict(arch="tiny",
                  moe_block_inds=[[], [], [0, 2, 4, 6, 8], [0, 2]],
                  num_experts=8, top_k=3, gate="cosine"),
    neck=dict(in_channels=[96, 192, 384, 768]))
work_dir = "./work_dirs/SM3Det_convnext_t"
