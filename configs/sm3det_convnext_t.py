# SM3Det flagship: ConvNeXt-T + 8-expert/top-3 grid MoE + DLA.
# Parity with configs/SM3Det/SM3Det_convnext_t.py.
_base_ = ["_base_/soi_det.py", "_base_/default_runtime.py"]

model = dict(
    type="TriSourceDetector",
    num_classes=26,
    angle_version="le90",
    backbone=dict(
        arch="tiny",
        drop_path_rate=0.1,
        moe_block_inds=[[], [], [0, 2, 4, 6, 8], [0, 2]],
        num_experts=8,
        top_k=3,
        gate="cosine",
        noisy_gating=True,
        capacity_factor=1.5,
        pretrained="data/pretrained/convnext-tiny.pth",
    ),
    neck=dict(in_channels=[96, 192, 384, 768], out_channels=256,
              num_outs=5, extra_level=1, add_extra_convs="on_output"),
    sar=dict(strides=[8, 16, 32, 64, 128], reg_max=16,
             nms_pre=1000, score_thr=0.05, nms_iou=0.6, max_per_img=100),
    rgb=dict(rpn_strides=[4, 8, 16, 32, 64],
             rpn_sample=256, rcnn_sample=512,
             rpn_nms_pre=2000, rpn_max=2000, rpn_nms_iou=0.8,
             rcnn_score_thr=0.05, rcnn_nms_iou=0.1, rcnn_max=2000),
)

optimizer = dict(type="AdamW", lr=1e-4, betas=(0.9, 0.999),
                 weight_decay=0.05, grad_clip=None)

# iteration math mirrors SM3Det_convnext_t.py:285-298
total_images = 46260 + 25028 + 17990
batch_size = 4            # per replica = sum(source_ratio)
num_replicas = 8          # reference trains on 8 GPUs
iters_per_epoch = total_images // (batch_size * num_replicas)
max_iters = iters_per_epoch * 12

lr_config = dict(
    policy="dynamic",
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=1.0 / 3,
    step=[iters_per_epoch * 8, iters_per_epoch * 11],
    extra_args=dict(T=3, b=0.4, ema=0.001,
                    backbone_policy="sigmoid_kl", head_policy="normal"),
)

checkpoint_interval = iters_per_epoch
# num_images=None: evaluate the WHOLE val split per pass (reference
# EvalHook behavior, mmrotate/apis/train.py:100-166)
evaluation = dict(interval=iters_per_epoch, num_images=None)
work_dir = "./work_dirs/sm3det_convnext_t"
