# Domain Attention baseline (parity: local_configs/main_DA_...py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(backbone=dict(
    moe_block_inds=[[], [], [], []],
    use_da=True,
    da_block_inds=[[], [], [0, 2, 4, 6, 8], [0, 2]]))
work_dir = "./work_dirs/da"
