# SAR specialist: ConvNeXt-T + FasterRCNN (hbb)
# (parity: local_configs/sardet50k_convnext_t_frcnn.py — reference uses mmdet FasterRCNN)
_base_ = ["sardet50k_convnext_t_gfl.py"]
model = dict(type="FasterRCNN",
             rpn_sample=256, rcnn_sample=512,
             rpn_nms_pre=2000, rpn_max=2000)
work_dir = "./work_dirs/sardet50k_convnext_t_frcnn"
