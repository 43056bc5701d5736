"""x2vlm_tpu — a TPU-native vision-language pre-training & fine-tuning framework.

Re-implements the capabilities of X2-VLM (zengyan-97/X2-VLM) as an idiomatic
JAX / XLA / Pallas / pjit stack:

- ``core``     — config system, device mesh, precision policy, multi-host init
- ``ops``      — kernel library: fused (flash) attention, layer primitives, box ops
- ``models``   — encoder stacks (BEiT-2 / CLIP-ViT / Swin vision; BERT / RoBERTa text
                 + cross-modal fusion) and the XVLM composition with its loss library
- ``parallel`` — sharding rules and mesh-parallel helpers
- ``data``     — host-side input pipeline (tokenization, masking, streaming readers)
- ``train``    — optimizer/schedule factories, jitted train steps, checkpointing
- ``tasks``    — end-user entry points (pretrain, retrieval, VQA, NLVR2, grounding,
                 captioning, video QA, multilingual IGLUE tasks)
- ``evalkit``  — vendored metric protocols (VQA accuracy, bbox IoU, caption metrics)
"""

__version__ = "0.1.0"
