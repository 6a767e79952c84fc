"""Models: frames, operator collections, generator/Hamiltonian/Lindblad models."""
from .rotating_frame import RotatingFrame
from .operator_collections import (
    OperatorCollection,
    ScipySparseOperatorCollection,
    LindbladCollection,
    ScipySparseLindbladCollection,
    VectorizedLindbladCollection,
    ScipySparseVectorizedLindbladCollection,
)
from .model_utils import vec_commutator, vec_dissipator
from .generator_model import BaseGeneratorModel, GeneratorModel
from .hamiltonian_model import HamiltonianModel
from .lindblad_model import LindbladModel
from .rotating_wave_approximation import rotating_wave_approximation
