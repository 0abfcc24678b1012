from anatomask_tpu.ops.pallas_conv import conv3d_3x3, pallas_conv3d_available
