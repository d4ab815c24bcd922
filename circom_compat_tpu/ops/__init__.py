"""Device kernels: limb codecs, Montgomery field ops, NTT, curve ops, MSM."""
