// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

import {VectorX} from "../src/VectorX.sol";

/// @notice Point an existing VectorX proxy at new circuit releases: update
///         both function IDs and the commitment tree size in one guardian
///         call (same env contract as the reference
///         contracts/script/UpdateFunctionIds.s.sol:10-26).
/// Env: CONTRACT_ADDRESS, HEADER_RANGE_FUNCTION_ID, ROTATE_FUNCTION_ID,
///      HEADER_RANGE_COMMITMENT_TREE_SIZE.
interface Vm {
    function envAddress(string calldata) external returns (address);
    function envUint(string calldata) external returns (uint256);
    function envBytes32(string calldata) external returns (bytes32);
    function startBroadcast() external;
    function stopBroadcast() external;
}

contract UpdateFunctionIds {
    Vm constant vm = Vm(address(uint160(uint256(keccak256("hevm cheat code")))));

    function run() external {
        VectorX lightClient = VectorX(vm.envAddress("CONTRACT_ADDRESS"));

        vm.startBroadcast();
        lightClient.updateFunctionIds(
            vm.envBytes32("HEADER_RANGE_FUNCTION_ID"),
            vm.envBytes32("ROTATE_FUNCTION_ID"),
            uint32(vm.envUint("HEADER_RANGE_COMMITMENT_TREE_SIZE"))
        );
        vm.stopBroadcast();
    }
}
