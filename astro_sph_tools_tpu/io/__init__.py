"""astro_sph_tools_tpu.io"""
