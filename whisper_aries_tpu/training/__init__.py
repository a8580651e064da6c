"""Training subsystem: synthetic corpus + model training loops."""
