# DOTA specialist: ConvNeXt-T + Oriented R-CNN
# (parity: local_configs/dota_convnext_t_orcnn.py)
_base_ = ["../_base_/soi_det.py", "../_base_/default_runtime.py"]
model = dict(
    type="OrientedRCNN", num_classes=26, angle_version="le90",
    backbone=dict(arch="tiny", drop_path_rate=0.1,
                  moe_block_inds=[[], [], [], []]),
    neck=dict(in_channels=[96, 192, 384, 768], out_channels=256,
              num_outs=5, extra_level=1),
    rcnn=dict(rpn_sample=256, rcnn_sample=512, rpn_nms_pre=2000,
              rpn_max=2000, rpn_nms_iou=0.8, score_thr=0.05,
              nms_iou=0.1, max_per_img=2000))
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05)
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[46927, 64524])
max_iters = 70390
work_dir = "./work_dirs/dota_orcnn"
