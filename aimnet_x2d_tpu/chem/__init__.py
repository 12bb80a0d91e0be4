from .featurize import compute_features, parse_atomic_numbers
from .smiles import Molecule, parse_smiles

__all__ = ["compute_features", "parse_atomic_numbers", "Molecule", "parse_smiles"]
