from rfnet_tpu.models.rfnet import RFNet, RFNetOutputs

__all__ = ["RFNet", "RFNetOutputs"]
