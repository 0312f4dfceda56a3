"""msnv_tpu — a TPU-native multi-speaker neural vocoder framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``mahdeslami11/jalil-saboorizadeh-Multi-speaker-Neural-Vocoder`` (a conditioned
multi-speaker SampleRNN vocoder, reference at /root/reference):

- hierarchical frame-level GRU tiers + a sample-level MLP emitting 8-bit
  mu-law-quantized 16 kHz speech (256-way softmax)  [ref model.py:18-325]
- Ahocoder acoustic conditioning (40 MFCC + logF0 + FV + U/V = 43 dims per
  80-sample frame) with optional look-ahead (43 -> 86)  [ref dataset.py:132-135, 213-221]
- learned speaker embeddings + per-speaker or joint conditioner normalization
  [ref model.py:103-116, dataset.py:166-198]
- truncated-BPTT training over packed lane-streams with hidden-state carry
  [ref dataset.py:143-163, model.py:328-349]
- autoregressive generation  [ref model.py:439-520]
- voice-conversion variant heads: bottleneck and adversarial (GAN)
  [ref doc/Barbany_report.pdf section 3.2]

The architecture is TPU-first, not a port: functional parameter pytrees,
`lax.scan` GRUs, jitted TBPTT train steps sharded over a `jax.sharding.Mesh`,
and a fused Pallas kernel for the sequential sample loop.
"""

__version__ = "0.1.0"
