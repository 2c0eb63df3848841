# SAR specialist: ConvNeXt-T + GFL
# (parity: local_configs/sardet50k_convnext_t_gfl.py)
_base_ = ["../_base_/soi_det.py", "../_base_/default_runtime.py"]
model = dict(
    type="GFL", num_classes=26, angle_version="le90",
    backbone=dict(arch="tiny", drop_path_rate=0.1,
                  moe_block_inds=[[], [], [], []]),
    neck=dict(in_channels=[96, 192, 384, 768], out_channels=256,
              num_outs=5, extra_level=1))
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05)
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[86737, 119264])
max_iters = 130106
work_dir = "./work_dirs/sardet50k_gfl"
