# SM3Det head-combo variant: s2anet_gfl
# (parity: local_configs/SM3Det_convnext_t_s2anet_gfl.py — reference TriSource
# H1stage-R1stage detector family)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(type="TriSourceVariant", sar_stages=1,
             rot_stages=1)
work_dir = "./work_dirs/SM3Det_convnext_t_s2anet_gfl"
