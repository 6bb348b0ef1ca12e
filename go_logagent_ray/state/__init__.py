"""go_logagent_ray.state"""
