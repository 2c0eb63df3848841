# BabelRS fine-tune: InternViT-300M adapter backbone + TriSource heads.
# Parity: BabelRS_configs/BabelRS_20kstep.py — InternViTAdapter backbone
# (embed_dim 1024, depth 24), layer-decay 0.95 over 24 layers
# (InternViTAdapterLayerDecayOptimizerConstructor, ref :285-288),
# lr 5e-5, 20k steps.
_base_ = ["../_base_/soi_det.py", "../_base_/default_runtime.py"]

angle_version = "le90"
num_classes = 26
source_ratio = [1, 1, 1]
img_size = 800

model = dict(
    type="TriSourceDetector",
    num_classes=26,
    angle_version="le90",
    backbone=dict(
        type="InternViTAdapter",
        embed_dim=1024, depth=24, num_heads=16, patch_size=16,
        interaction_indexes=[5, 11, 17, 23],
        adapter_dim=256, multi_input=True,
        pretrained="data/pretrained/BabelRS_ViT-300M.safetensors",
        moe_block_inds=[[], [], [], []],
    ),
    neck=dict(in_channels=[256, 256, 256, 256], out_channels=256,
              num_outs=5, extra_level=1, add_extra_convs="on_output"),
    sar=dict(strides=[8, 16, 32, 64, 128], reg_max=16,
             nms_pre=1000, score_thr=0.05, nms_iou=0.6, max_per_img=100),
    rgb=dict(rpn_strides=[4, 8, 16, 32, 64],
             rpn_sample=256, rcnn_sample=512,
             rpn_nms_pre=2000, rpn_max=2000, rpn_nms_iou=0.8,
             rcnn_score_thr=0.05, rcnn_nms_iou=0.1, rcnn_max=2000),
)

optimizer = dict(type="AdamW", lr=5e-5, betas=(0.9, 0.999),
                 weight_decay=0.05, grad_clip=None,
                 # per-depth LR decay (layer_decay_optimizer_constructor)
                 layer_decay=dict(rate=0.95, num_layers=24))
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[16000, 19000])
max_iters = 20000
checkpoint_interval = 2000
work_dir = "./work_dirs/babelrs_20kstep"
