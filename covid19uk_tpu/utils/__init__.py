"""Host-side utilities: HDF5 group IO, event imputation, posterior store."""
