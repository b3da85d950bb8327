"""Multi-device (mesh) execution: landmark-sharded distributed BA."""
