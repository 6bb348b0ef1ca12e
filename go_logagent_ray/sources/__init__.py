"""go_logagent_ray.sources"""
