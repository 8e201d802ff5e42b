from tvc.entropy.cdf import build_cdf_table, pmf_to_quantized_cdf
from tvc.entropy.factorized import FactorizedCoder, FactorizedEntropy
from tvc.entropy.gaussian import (
    GaussianCoder,
    build_indexes_jax,
    build_indexes_np,
    gaussian_likelihood,
    get_scale_table,
)
from tvc.entropy.rans import PyRansDecoder, PyRansEncoder, RansDecoder, RansEncoder

__all__ = [
    "build_cdf_table",
    "pmf_to_quantized_cdf",
    "FactorizedCoder",
    "FactorizedEntropy",
    "GaussianCoder",
    "build_indexes_jax",
    "build_indexes_np",
    "gaussian_likelihood",
    "get_scale_table",
    "RansEncoder",
    "RansDecoder",
    "PyRansEncoder",
    "PyRansDecoder",
]
