"""dg_sct_tpu: TPU-native rebuild of DG-SCT (NeurIPS 2023).

A parameter-efficient audio-visual adapter framework: frozen HTS-AT (audio)
and Swin-V2-L (vision) towers run in lockstep with trainable DG-SCT
spatial/channel/temporal cross-modal prompt adapters between every paired
block, feeding task heads for AVE / AVVP / AVS / AVQA.

Built JAX/XLA/Pallas-first; reference repo: haoyi-duan/DG-SCT.
"""

__version__ = "0.1.0"
