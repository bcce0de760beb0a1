"""Sources: synthetic input generation, encoded-block reading, manifests."""
