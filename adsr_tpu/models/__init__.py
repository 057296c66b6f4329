from adsr_tpu.models.drn import DRN, DownBlock
from adsr_tpu.models.drct import DRCT
from adsr_tpu.models.efficientad import PDN, Autoencoder

__all__ = ["DRN", "DownBlock", "DRCT", "PDN", "Autoencoder"]
