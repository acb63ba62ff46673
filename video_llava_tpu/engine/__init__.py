"""Engine layer: weight loading, sharded execution, generation."""
