"""Pure-numpy kernels (no Spark imports): S2 cell math, geometry, image codecs."""
