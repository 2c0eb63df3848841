# DLA ablation: T=2, b=0.4 (e8k2 MoE)
# (parity: local_configs/ablation_dynlr_convnext_t_orcnn_gfl_moe_t2b04.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(backbone=dict(num_experts=8, top_k=2))
lr_config = dict(extra_args=dict(T=2, b=0.4, ema=0.001,
                                 backbone_policy="sigmoid_kl",
                                 head_policy="normal"))
work_dir = "./work_dirs/ablation_dynlr_convnext_t_orcnn_gfl_moe_t2b04"
