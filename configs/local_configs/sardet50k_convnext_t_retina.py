# SAR specialist: ConvNeXt-T + RetinaNet (hbb)
# (parity: local_configs/sardet50k_convnext_t_retina.py — reference uses mmdet RetinaNet)
_base_ = ["sardet50k_convnext_t_gfl.py"]
model = dict(type="RetinaNet",
             rpn_sample=256, rcnn_sample=512,
             rpn_nms_pre=2000, rpn_max=2000)
work_dir = "./work_dirs/sardet50k_convnext_t_retina"
