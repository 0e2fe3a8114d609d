"""renderformer_tpu: a TPU-native (JAX/XLA/Pallas) RenderFormer framework.

Re-designed from scratch with the capabilities of agwi-lab/renderformer
(reference snapshot 2025-09-05): transformer-based neural rendering of
triangle meshes with global illumination.
"""

from renderformer_tpu.config import RenderFormerConfig, RuntimeConfig, PRESETS
from renderformer_tpu.models.renderformer import RenderFormer
from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline

__version__ = '0.1.0'

__all__ = [
    'RenderFormer',
    'RenderFormerConfig',
    'RenderingPipeline',
    'RuntimeConfig',
    'PRESETS',
]
