# DLA ablation: T=3, b=0.5 (e8k2 MoE)
# (parity: local_configs/ablation_dynlr_convnext_t_orcnn_gfl_moe_t3b05.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(backbone=dict(num_experts=8, top_k=2))
lr_config = dict(extra_args=dict(T=3, b=0.5, ema=0.001,
                                 backbone_policy="sigmoid_kl",
                                 head_policy="normal"))
work_dir = "./work_dirs/ablation_dynlr_convnext_t_orcnn_gfl_moe_t3b05"
