from .synthetic import synthetic_molecules, synthetic_khop_graphs

__all__ = ["synthetic_molecules", "synthetic_khop_graphs"]
