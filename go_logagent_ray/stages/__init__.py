"""go_logagent_ray.stages"""
