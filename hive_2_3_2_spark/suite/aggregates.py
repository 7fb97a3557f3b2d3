"""(filled in progressively this round)"""
