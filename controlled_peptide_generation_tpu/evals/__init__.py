from .peptide_evals import PeptideEvaluator
