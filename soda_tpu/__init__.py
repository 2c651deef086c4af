"""SODA-TPU: a TPU-native stencil dataflow compiler & runtime.

A ground-up rebuild of the capabilities of Blaok/soda (ICCAD'18 / DAC'20)
targeting TPUs through JAX/XLA/Pallas instead of FPGA HLS. See SURVEY.md
for the reference layer map this framework mirrors.
"""

__version__ = '0.1.0'
