"""vis_tpu — a TPU-native visual-inspection framework.

A from-scratch rebuild of the Vision-Inspection-System reference
(Aditya-Somasi/Vision-Inspection-System) with the remote VLM calls replaced by
on-pod JAX/XLA/Pallas inference and the image hot path fused into device
kernels.  The deterministic verdict surface (schemas, consensus, gates,
aggregation) is bit-compatible with the reference.

Layering (top to bottom): app / reporting / orchestration / safety / agents /
serving / models / ops / parallel / database / utils.
"""

__version__ = "0.1.0"
