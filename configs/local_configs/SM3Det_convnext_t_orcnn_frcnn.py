# SM3Det head-combo variant: orcnn_frcnn
# (parity: local_configs/SM3Det_convnext_t_orcnn_frcnn.py — reference TriSource
# H2stage-R2stage detector family)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(type="TriSourceVariant", sar_stages=2,
             rot_stages=2)
work_dir = "./work_dirs/SM3Det_convnext_t_orcnn_frcnn"
