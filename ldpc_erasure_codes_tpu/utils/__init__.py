"""Utilities: NumPy oracle, configuration, CLI, golden-vector IO."""
