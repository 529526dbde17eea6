"""(placeholder — filled in by later milestones)"""
