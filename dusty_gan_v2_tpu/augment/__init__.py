from .ada import AdaptiveAugment, AdaState

__all__ = ["AdaptiveAugment", "AdaState"]
