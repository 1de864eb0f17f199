"""Inference layer: HMC, adaptive warmup, event-time MCMC kernels, driver."""
