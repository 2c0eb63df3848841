# SM3Det head-combo variant: roitrans_retina
# (parity: local_configs/SM3Det_convnext_t_roitrans_retina.py — reference TriSource
# H1stage-R2stage detector family)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(type="TriSourceVariant", sar_stages=1,
             rot_stages=2)
work_dir = "./work_dirs/SM3Det_convnext_t_roitrans_retina"
