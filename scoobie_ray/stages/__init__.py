from .segment import segment_batch
from .spot import Spotter, SpotConfig

__all__ = ["segment_batch", "Spotter", "SpotConfig"]
