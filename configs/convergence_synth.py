# Convergence-evidence run (PARITY.md): flagship-shaped TriSource model
# at 256px on the learnable StructuredSyntheticDetDataset, with held-out
# multi-val mAP logged per interval — stands in for the reference's
# SOI-Det training loop (real datasets are not in the image).
_base_ = ["_base_/default_runtime.py"]

angle_version = "le90"
num_classes = 4
source_ratio = [2, 1, 1]
img_size = 256

data = dict(
    sar=dict(type="StructuredSyntheticDetDataset", n=256, max_gt=8),
    rgb=dict(type="StructuredSyntheticDetDataset", n=256, max_gt=8),
    ifr=dict(type="StructuredSyntheticDetDataset", n=256, max_gt=8),
)

model = dict(
    type="TriSourceDetector",
    num_classes=4,
    angle_version="le90",
    backbone=dict(arch="atto", drop_path_rate=0.0,
                  moe_block_inds=[[], [], [0, 2], []],
                  num_experts=4, top_k=2, gate="cosine",
                  capacity_factor=1.5),
    neck=dict(in_channels=[40, 80, 160, 320], out_channels=96,
              num_outs=5, extra_level=1, add_extra_convs="on_output"),
    sar=dict(strides=[8, 16, 32, 64, 128], reg_max=8,
             nms_pre=200, score_thr=0.05, nms_iou=0.6, max_per_img=50),
    rgb=dict(rpn_strides=[4, 8, 16, 32, 64],
             rpn_sample=128, rcnn_sample=192,
             rpn_nms_pre=400, rpn_max=400, rpn_nms_iou=0.8,
             rcnn_score_thr=0.05, rcnn_nms_iou=0.1, rcnn_max=50),
)

optimizer = dict(type="AdamW", lr=2.5e-4, betas=(0.9, 0.999),
                 weight_decay=0.05, grad_clip=dict(max_norm=10.0))
lr_config = dict(policy="dynamic", warmup="linear", warmup_iters=50,
                 warmup_ratio=1.0 / 3, step=[500],
                 extra_args=dict(T=3, b=0.4, ema=0.001,
                                 backbone_policy="sigmoid_kl",
                                 head_policy="normal"))
evaluation = dict(interval=100, num_images=24, seed_offset=100)
max_iters = 600
log_interval = 20
checkpoint_interval = 300
work_dir = "./work_dirs/convergence_synth"
