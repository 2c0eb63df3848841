# Tiny smoke-test config: atto backbone, 64px images, synthetic data.
_base_ = ["_base_/default_runtime.py"]

angle_version = "le90"
num_classes = 4
source_ratio = [2, 1, 1]
img_size = 64

data = dict(
    sar=dict(type="SyntheticDetDataset", max_gt=8),
    rgb=dict(type="SyntheticDetDataset", max_gt=8),
    ifr=dict(type="SyntheticDetDataset", max_gt=8),
)

model = dict(
    type="TriSourceDetector",
    num_classes=4,
    angle_version="le90",
    backbone=dict(arch="atto", drop_path_rate=0.0,
                  moe_block_inds=[[], [], [0], []],
                  num_experts=2, top_k=2, gate="cosine",
                  capacity_factor=2.0),
    neck=dict(in_channels=[40, 80, 160, 320], out_channels=32,
              num_outs=5, extra_level=1, add_extra_convs="on_output"),
    sar=dict(strides=[8, 16, 32, 64, 128], reg_max=8,
             nms_pre=50, score_thr=0.05, nms_iou=0.6, max_per_img=20),
    rgb=dict(rpn_strides=[4, 8, 16, 32, 64],
             rpn_sample=32, rcnn_sample=32,
             rpn_nms_pre=64, rpn_max=64, rpn_nms_iou=0.8,
             rcnn_score_thr=0.05, rcnn_nms_iou=0.1, rcnn_max=20),
)

optimizer = dict(type="AdamW", lr=1e-4, betas=(0.9, 0.999),
                 weight_decay=0.05, grad_clip=None)
lr_config = dict(policy="dynamic", warmup="linear", warmup_iters=2,
                 warmup_ratio=1.0 / 3, step=[100],
                 extra_args=dict(T=3, b=0.4, ema=0.001,
                                 backbone_policy="sigmoid_kl",
                                 head_policy="normal"))
max_iters = 4
log_interval = 2
work_dir = "./work_dirs/smoke_tiny"
