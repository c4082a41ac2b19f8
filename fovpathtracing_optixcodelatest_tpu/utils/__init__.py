"""Utilities: image IO, metrics/telemetry logging, SSIM."""
