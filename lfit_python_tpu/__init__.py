"""lfit_python_tpu — TPU-native eclipsing-CV light-curve fitting framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``wildjames/lfit_python`` stack (see SURVEY.md): the four-component
cataclysmic-variable eclipse model, hierarchical shared-parameter trees,
celerite-style GP flickering likelihoods, and an on-device affine-invariant
ensemble sampler, batched over walkers and sharded over a TPU mesh.
"""

__version__ = "0.1.0"
